"""Literal per-sample/per-frame transcription of af_dynaudnorm.c for
testing gmat_tpu/av/dynaudnorm.py (which is vectorized and structured
differently).  Flat Python lists, the C's loops and expressions."""
import math

import numpy as np

DBL_EPSILON = np.finfo(np.float64).eps
DBL_MAX = np.finfo(np.float64).max
CONST = 0.8862269254527580136490837416705725913987747280611935


def frame_size(rate, msec):
    n = int(np.rint(rate * (msec / 1000.0)))
    return n + (n % 2)


def fade(prev, nxt, pos, length):
    step = 1.0 / length
    f0 = 1.0 - (step * (pos + 1.0))
    return f0 * prev + (1.0 - f0) * nxt


def bound(threshold, val):
    return math.erf(CONST * (val / threshold)) * threshold


def _llrint63(x):
    """llrint(x * 2^63): x86-64 overflow -> INT64_MIN (cvttsd2si)."""
    v = float(np.rint(x * float(1 << 63)))
    if v >= float(1 << 63) or v < -float(1 << 63):
        return -(1 << 63)
    return int(v)


def setup_compress_thresh(threshold):
    if threshold > DBL_EPSILON and threshold < 1.0 - DBL_EPSILON:
        current = threshold
        step = 1.0
        while step > DBL_EPSILON:
            while (_llrint63(current + step) > _llrint63(current)
                   and bound(current + step, 1.0) <= threshold):
                current += step
            step /= 2.0
        return current
    return threshold


class OracleDynaudnorm:
    def __init__(self, rate, channels, framelen=500, gausssize=31,
                 peak=0.95, maxgain=10.0, targetrms=0.0, coupling=True,
                 correctdc=False, altboundary=False, compress=0.0,
                 threshold=0.0, overlap=0.0):
        self.rate, self.ch = rate, channels
        self.filter_size = gausssize | 1
        self.peak_value, self.max_amplification = peak, maxgain
        self.target_rms, self.channels_coupled = targetrms, coupling
        self.dc_correction, self.alt_boundary_mode = correctdc, altboundary
        self.compress_factor, self.threshold = compress, threshold
        self.frame_len = frame_size(rate, framelen)
        self.sample_advance = max(1, int(np.rint(self.frame_len
                                                 * (1.0 - overlap))))
        sigma = ((self.filter_size / 2.0 - 1.0) / 3.0) + 1.0 / 3.0
        off = self.filter_size // 2
        c1 = 1.0 / (sigma * math.sqrt(2.0 * math.pi))
        c2 = 2.0 * sigma * sigma
        w = [c1 * math.exp(-(i - off) * (i - off) / c2)
             for i in range(self.filter_size)]
        tw = sum(w)
        self.weights = [x / tw for x in w]
        self.prev_amp = [1.0] * channels
        self.dc_val = [0.0] * channels
        self.comp_thresh = [0.0] * channels
        self.gh_orig = [[] for _ in range(channels)]
        self.gh_min = [[] for _ in range(channels)]
        self.gh_smooth = [[] for _ in range(channels)]
        self.th_hist = [[] for _ in range(channels)]
        # ff_get_audio_buffer(outlink, frame_len * 2): the analysis
        # window frame is twice frame_len, upper half permanently zero
        self.window = [[0.0] * (self.frame_len * 2)
                       for _ in range(channels)]
        self.queue = []
        self.eof = False

    # frame: list of per-channel lists (planar like the C)

    def _peak(self, frame, channel):
        mx = DBL_EPSILON
        chans = range(self.ch) if channel == -1 else [channel]
        for c in chans:
            for v in frame[c]:
                mx = max(mx, abs(v))
        return mx

    def _rms(self, frame, channel):
        s = 0.0
        if channel == -1:
            for c in range(self.ch):
                for v in frame[c]:
                    s += v * v
            s /= len(frame[0]) * self.ch
        else:
            for v in frame[channel]:
                s += v * v
            s /= len(frame[channel])
        return max(math.sqrt(s), DBL_EPSILON)

    def _std(self, frame, channel):
        s = 0.0
        if channel == -1:
            for c in range(self.ch):
                for v in frame[c]:
                    s += v * v
            s /= (self.ch * len(frame[0])) - 1
        else:
            for v in frame[channel]:
                s += v * v
            s /= len(frame[channel]) - 1
        return max(math.sqrt(s), DBL_EPSILON)

    def _local_gain(self, frame, channel):
        peak = self._peak(frame, channel)
        mg = self.peak_value / peak
        rg = self.target_rms / self._rms(frame, channel) \
            if self.target_rms > DBL_EPSILON else DBL_MAX
        return (bound(self.max_amplification, min(mg, rg)),
                1.0 if peak > self.threshold else 0.0)

    def _update_history(self, c, gain, thresh):
        orig, mini = self.gh_orig[c], self.gh_min[c]
        smooth, thist = self.gh_smooth[c], self.th_hist[c]
        pre = self.filter_size // 2
        if not orig:
            init = gain if self.alt_boundary_mode else min(1.0, gain)
            self.prev_amp[c] = init
            while len(orig) < pre:
                orig.append(init)
                thist.append(thresh)
        orig.append(gain)
        while len(orig) >= self.filter_size:
            if not mini:
                init = orig[0] if self.alt_boundary_mode else 1.0
                inp = pre
                while len(mini) < pre:
                    inp += 1
                    init = min(init, orig[inp])
                    mini.append(init)
            mn = DBL_MAX
            for v in orig:
                mn = min(mn, v)
            mini.append(mn)
            thist.append(thresh)
            orig.pop(0)
        while len(mini) >= self.filter_size:
            result, tsum = 0.0, 0.0
            for i in range(len(mini)):
                tsum += thist[i] * self.weights[i]
                result += thist[i] * self.weights[i] * mini[i]
            if tsum == 0.0:
                result = 1.0
            result = min(result, orig[0])
            smooth.append(result)
            mini.pop(0)
            thist.pop(0)

    def _dc(self, frame):
        n = len(frame[0])
        diff = 1.0 / n
        first = not self.gh_orig[0]
        for c in range(self.ch):
            avg = 0.0
            for v in frame[c]:
                avg += v * diff
            prev = avg if first else self.dc_val[c]
            self.dc_val[c] = avg if first else \
                0.1 * avg + (1.0 - 0.1) * self.dc_val[c]
            for i in range(n):
                frame[c][i] -= fade(prev, self.dc_val[c], i, n)

    def _compress(self, frame):
        n = len(frame[0])
        first = not self.gh_orig[0]
        if self.channels_coupled:
            std = self._std(frame, -1)
            cur = min(1.0, self.compress_factor * std)
            prev = cur if first else self.comp_thresh[0]
            self.comp_thresh[0] = cur if first else \
                (1.0 / 3.0) * cur + (1.0 - 1.0 / 3.0) * self.comp_thresh[0]
            pa = setup_compress_thresh(prev)
            ca = setup_compress_thresh(self.comp_thresh[0])
            for c in range(self.ch):
                for i in range(n):
                    lt = fade(pa, ca, i, n)
                    frame[c][i] = math.copysign(
                        bound(lt, abs(frame[c][i])), frame[c][i])
        else:
            for c in range(self.ch):
                std = self._std(frame, c)
                cur = setup_compress_thresh(
                    min(1.0, self.compress_factor * std))
                prev = cur if first else self.comp_thresh[c]
                self.comp_thresh[c] = cur if first else \
                    (1.0 / 3.0) * cur + (1.0 - 1.0 / 3.0) \
                    * self.comp_thresh[c]
                pa = setup_compress_thresh(prev)
                ca = setup_compress_thresh(self.comp_thresh[c])
                for i in range(n):
                    lt = fade(pa, ca, i, n)
                    frame[c][i] = math.copysign(
                        bound(lt, abs(frame[c][i])), frame[c][i])

    def _analyze(self, frame):
        if self.dc_correction:
            self._dc(frame)
        if self.compress_factor > DBL_EPSILON:
            self._compress(frame)
        if self.frame_len != self.sample_advance:
            off = self.frame_len - self.sample_advance
            n = len(frame[0])
            for c in range(self.ch):
                w = self.window[c]
                w[:off] = w[self.sample_advance:self.sample_advance + off]
                for i in range(n):
                    w[off + i] = frame[c][i]
                for i in range(off + n, self.frame_len):
                    w[i] = 0.0
            analyze = self.window
        else:
            analyze = frame
        if self.channels_coupled:
            g, t = self._local_gain(analyze, -1)
            for c in range(self.ch):
                self._update_history(c, g, t)
        else:
            for c in range(self.ch):
                g, t = self._local_gain(analyze, c)
                self._update_history(c, g, t)

    def _amplify(self, frame):
        n = len(frame[0])
        out = [[0.0] * n for _ in range(self.ch)]
        for c in range(self.ch):
            cur = self.gh_smooth[c].pop(0)
            for i in range(n):
                out[c][i] = frame[c][i] * fade(self.prev_amp[c], cur,
                                               i, n)
            self.prev_amp[c] = cur
        return out

    def _filter_frame(self, frame):
        outs = []
        while ((len(self.queue) >= self.filter_size
                or (self.eof and self.queue)) and self.gh_smooth[0]):
            outs.append(self._amplify(self.queue.pop(0)))
        if frame is not None:
            self._analyze(frame)
            if not self.eof:
                self.queue.append(frame)
        return outs

    def run(self, x):
        """x: (n, ch) float64 interleaved -> (m, ch) float64."""
        outs = []
        pos = 0
        while pos + self.sample_advance <= len(x):
            frame = [x[pos:pos + self.sample_advance, c].tolist()
                     for c in range(self.ch)]
            outs.extend(self._filter_frame(frame))
            pos += self.sample_advance
        if pos < len(x):
            frame = [x[pos:, c].tolist() for c in range(self.ch)]
            outs.extend(self._filter_frame(frame))
        self.eof = True
        while self.queue:
            if self.gh_smooth[0]:
                fill = DBL_EPSILON if self.alt_boundary_mode else (
                    min(self.peak_value, self.target_rms)
                    if self.target_rms > DBL_EPSILON else self.peak_value)
                syn = []
                for c in range(self.ch):
                    col = []
                    for i in range(self.sample_advance):
                        v = fill * (-1.0 if (i % 2) == 1 else 1.0) \
                            if self.dc_correction else fill
                        if self.dc_correction:
                            v += self.dc_val[c]
                        col.append(v)
                    syn.append(col)
                outs.extend(self._filter_frame(syn))
            else:
                outs.append(self.queue.pop(0))
        cols = []
        for fr in outs:
            cols.append(np.array(fr).T)
        return np.concatenate(cols) if cols else x[:0]
