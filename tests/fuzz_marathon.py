"""Opt-in long fuzz harness (not collected by pytest by default).

Run from the repo root:
    GMAT_FUZZ_N=12000 python tests/fuzz_marathon.py
Byte flips/deletes/inserts over every JPEG wire format (native decode
incl. the segment-parallel path), property-rich/grid/sequence HEICs,
and HEVC slices+SEI; anything outside the parsers' documented error
types is a finding.  Last full run: 12,000 iterations, zero unexpected
exceptions (PARITY round-3 sweep section).
"""
import sys, os, random, ctypes
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["GMAT_EXPR_WHILE_CAP"] = "100000"   # unbounded-by-spec while()
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from gmat_tpu.av import heif, hevc, jpeg_tpu, native
from gmat_tpu.core.frame import from_numpy_yuv420

rng = random.Random(99)
lib = native.load("gmat_jpeg")
p16 = ctypes.POINTER(ctypes.c_int16)

y = np.random.RandomState(0).randint(0, 256, (1, 48, 64)).astype(np.uint8)
u = np.random.RandomState(1).randint(0, 256, (1, 24, 32)).astype(np.uint8)
v = np.random.RandomState(2).randint(0, 256, (1, 24, 32)).astype(np.uint8)
fb = from_numpy_yuv420(y, u, v)
corpus_jpeg = [jpeg_tpu.encode_batch(fb, 85)[0],
               jpeg_tpu.encode_batch(fb, 85, progressive=True)[0],
               jpeg_tpu.encode_batch(fb, 85, restart_mcus=2)[0],
               jpeg_tpu.encode_batch(fb, 85, optimize=True)[0]]
alpha = np.full((48, 64), 200, np.uint8)
heic = heif.encode_still(y[0], u[0], v[0], crf=24.0, rotation=90,
                         exif=b"II*\x00" + bytes(8), alpha=alpha,
                         thumbnail=(32, 24), colr="pq",
                         content_light=(100, 50))
grid = heif.encode_still_grid(
    np.random.RandomState(3).randint(0, 256, (96, 128)).astype(np.uint8),
    np.full((48, 64), 100, np.uint8), np.full((48, 64), 150, np.uint8),
    tile=64, crf=24.0)
seq = heif.encode_sequence([(y[0], u[0], v[0])] * 6, fps=30, crf=24.0,
                           gop=6, bf=2, presentation_delay=3)
henc = __import__("gmat_tpu.av.toolkit", fromlist=["toolkit"])
hevc_pkts = None
try:
    import gmat_tpu.av.toolkit as tk
    e = tk.Encoder("libx265", 64, 48, fps=(30,1), gop=6, bf=2, crf=26.0,
                   opts="x265-params=log-level=0:hrd=1:vbv-bufsize=200:vbv-maxrate=100")
    ps = []
    for i in range(6):
        ps += e.encode(y[0][:48,:64], u[0][:24,:32], v[0][:24,:32], pts=i)
    ps += e.flush()
    hevc_pkts = [e.extradata() + ps[0].data] + [p.data for p in ps[1:]]
    e.close()
except Exception as ex:
    print("hevc corpus fail", ex)

def mutate(b, nmut):
    m = bytearray(b)
    for _ in range(nmut):
        op = rng.random()
        if op < 0.6:
            m[rng.randrange(len(m))] = rng.randrange(256)
        elif op < 0.8 and len(m) > 40:
            i = rng.randrange(len(m) - 16)
            del m[i:i + rng.randrange(1, 16)]
        else:
            i = rng.randrange(len(m))
            m[i:i] = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 8)))
    return bytes(m)

def native_jpeg_decode(data):
    buf = np.frombuffer(data, np.uint8)
    hnd = lib.gjpeg_parse(buf.ctypes.data_as(native.c_pu8), len(data))
    if not hnd:
        return
    try:
        wi, hi, ss = ctypes.c_int(), ctypes.c_int(), ctypes.c_int()
        lib.gjpeg_info(hnd, ctypes.byref(wi), ctypes.byref(hi), ctypes.byref(ss))
        w, h, sub = wi.value, hi.value, ss.value
        if not (0 < w <= 4096 and 0 < h <= 4096):
            return
        if sub == 0:
            mx, my = (w + 15)//16, (h + 15)//16
            yb, cb = (my*2, mx*2), (my, mx)
        elif sub == 3:
            mx, my = (w + 15)//16, (h + 7)//8
            yb, cb = (my, mx*2), (my, mx)
        elif sub == 2:
            yb, cb = ((h+7)//8, (w+7)//8), (1, 1)
        else:
            yb = cb = ((h+7)//8, (w+7)//8)
        yc = np.zeros(yb + (64,), np.int16)
        uc = np.zeros(cb + (64,), np.int16)
        vc = np.zeros(cb + (64,), np.int16)
        lib.gjpeg_decode_coefs(hnd, yc.ctypes.data_as(p16),
                               uc.ctypes.data_as(p16), vc.ctypes.data_as(p16))
        lib.gjpeg_decode_coefs_mt(hnd, yc.ctypes.data_as(p16),
                                  uc.ctypes.data_as(p16),
                                  vc.ctypes.data_as(p16), 2)
    finally:
        lib.gjpeg_free(hnd)

from gmat_tpu.filters.expr import compile_expr, _FUNCS

_EXPR_TOKENS = (list(_FUNCS) + ["if", "ifnot", "and", "or", "st", "ld",
                "random", "while", "taylor", "root", "print",
                "(", ")", ",", "+", "-", "*", "/", "^", ";",
                "0", "1", "2.5", "1e3", "0xff", "3dB", "1Ki", "nan_var",
                "n", "t", "scene", "PI", "E", "QP2LAMBDA"])

def fuzz_expr():
    """Random token soup -> parse+eval must only ever raise ValueError
    (or return a float).  Token-pool guided so a useful fraction parses."""
    k = rng.randrange(1, 24)
    text = "".join(rng.choice(_EXPR_TOKENS) for _ in range(k))
    if rng.random() < 0.2:       # raw byte garbage lane
        text = "".join(chr(rng.randrange(32, 127)) for _ in range(k))
    try:
        e = compile_expr(text)
        v = e({"n": 3.0, "t": 0.5, "scene": 0.7, "nan_var": float("nan")})
    except ValueError:
        return                   # the engine's one documented error type
    except RecursionError:
        return                   # deeply nested parens: Python limit
    except Exception as ex:      # anything else violates the contract —
        raise AssertionError(    # AssertionError is NOT in ALLOWED
            f"expr raised {type(ex).__name__} on {text!r}") from ex
    assert isinstance(v, float), (text, v)

from gmat_tpu.filters.lut3d import parse_cube, parse_3dl

_CUBE_BASE = ("LUT_3D_SIZE 3\n" + "\n".join(
    f"{r/2} {g/2} {b/2}" for b in range(3) for g in range(3)
    for r in range(3))).encode()

def fuzz_cube(nm):
    """3D-LUT text parsers: only LutError (a ValueError) may escape."""
    b = mutate(_CUBE_BASE, nm)
    txt = b.decode("latin-1")
    parse_cube(txt)
    parse_3dl(txt)


_AUDIO_DESCS = [
    "loudnorm=I=-16:TP=-1.5:LRA=11", "dynaudnorm=f=200:g=7:s=2:p=0.9",
    "aecho=0.6:0.3:40|90:0.4|0.2", "pan=stereo|c0=0.5*c0+0.5*c1|c1=c1",
    "amix=inputs=2:duration=first:weights=1 0.5",
    "afade=t=in:d=2:curve=qsin", "atempo=1.25,volume=0.5,aresample=32000",
]


def fuzz_audio_desc(nm):
    """Audio filter-chain descriptions: parse_audio_filters and the
    per-filter option parsers may only raise ValueError on garbage."""
    from gmat_tpu.av.audio_filters import parse_audio_filters
    base = _AUDIO_DESCS[rng.randrange(len(_AUDIO_DESCS))].encode()
    txt = mutate(base, nm).decode("latin-1")
    parse_audio_filters(txt)

ALLOWED = (IOError, ValueError, __import__("struct").error, IndexError,
           KeyError, EOFError, OverflowError, ZeroDivisionError)
crashes = []
N = int(os.environ.get("GMAT_FUZZ_N", "2000"))
for it in range(N):
    k = it % 7
    nm = rng.randrange(1, 12)
    try:
        if k in (0, 1):
            native_jpeg_decode(mutate(corpus_jpeg[rng.randrange(4)], nm))
        elif k == 2:
            b = mutate(heic, nm)
            r = heif.HeifReader(b)
            r.color_info(); r.exif(); r.alpha_item(); r.thumbnail_item()
            for item in r.items[:2]:
                item.to_annexb()
        elif k == 3:
            heif.HeifReader(mutate(grid, nm))
        elif k == 4:
            heif.HeifSequenceReader(mutate(seq, nm))
        else:
            if k == 5:
                pkt = mutate(hevc_pkts[rng.randrange(len(hevc_pkts))], nm)
                hevc.parse_stream_slices([pkt])
                hevc.stream_hdr_metadata([pkt])
                hevc.stream_timing_info([pkt])
            elif it % 3 == 1:
                fuzz_expr()
            elif it % 3 == 2:
                fuzz_cube(nm)
            else:
                fuzz_audio_desc(nm)
    except ALLOWED:
        pass
    except Exception as e:
        crashes.append((k, it, type(e).__name__, str(e)[:120]))
        if len(crashes) > 8:
            break
print(f"{N} iterations, {len(crashes)} unexpected exceptions")
for c in crashes:
    print(c)
