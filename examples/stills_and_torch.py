"""Still-image codecs + PyTorch interop.

Run: python examples/stills_and_torch.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    h, w = 360, 640
    y = np.add.outer(np.linspace(20, 220, h), np.linspace(0, 30, w)).astype(np.uint8)
    u = np.full((h // 2, w // 2), 96, np.uint8)
    v = np.full((h // 2, w // 2), 160, np.uint8)

    # TPU JPEG: batch DCT/quant on the MXU + native Huffman coding
    from gmat_tpu.av import jpeg_tpu
    from gmat_tpu.core.frame import from_numpy_yuv420
    fb = from_numpy_yuv420(np.stack([y] * 8), np.stack([u] * 8),
                           np.stack([v] * 8))
    blobs = jpeg_tpu.encode_batch(fb, quality=90)
    back = jpeg_tpu.decode_batch(blobs)
    print(f"JPEG batch: 8 x {len(blobs[0])} bytes, "
          f"decode mean err "
          f"{np.abs(np.asarray(back.planes['y'])[0].astype(int) - y).mean():.2f}")

    # HEIF still + sequence (pure-Python ISOBMFF + x265)
    from gmat_tpu.av import heif
    still = heif.encode_still(y, u, v, crf=20.0)
    seq = heif.encode_sequence([(y, u, v)] * 4, fps=30)
    print(f"HEIF: still {len(still)} bytes, 4-frame sequence {len(seq)} bytes")
    y2, _, _ = heif.decode_still(still)
    print(f"HEIF decode mean err {np.abs(y2.astype(int) - y).mean():.2f}")

    # torch interop (DLPack)
    try:
        from gmat_tpu.av.torch_interop import jax_to_torch
        from gmat_tpu.ops import fused
        x = fused.preprocess_nchw(fb, 224, 224)
        t = jax_to_torch(x)
        print(f"torch tensor: {tuple(t.shape)} {t.dtype}")
    except ImportError:
        print("torch not available")


if __name__ == "__main__":
    main()
