"""Independent per-sample oracle for loudnorm / ebur128.

Literal transcriptions of the C loops in
/root/reference/ffmpeg-gpu/libavfilter/ebur128.c and af_loudnorm.c —
flat buffers, per-sample while loops, the same quirks (stale prev_smp
on failed peak candidates, SUSTAIN's full-length rescan, the `>`
ring-wrap in the attack setup).  This is deliberately NOT the
implementation's structure (gmat_tpu/av/loudnorm.py is
segment-vectorized numpy; gmat_tpu/av/ebur128.py runs scipy lfilter):
agreement between the two is the test.

The one knowing divergence: the K-weighting IIR here is the C's direct
form II; the implementation uses lfilter (transposed form) — outputs
agree to ~1e-13, so comparisons use small tolerances instead of
bit-equality.
"""
import math

import numpy as np


def frame_size(rate, msec):
    n = int(round(rate * (msec / 1000.0)))
    return n + (n % 2)


# ---------------------------------------------------------------------------
# ebur128 (literal)

UNUSED, LEFT, RIGHT, CENTER, LEFT_SURROUND, RIGHT_SURROUND, DUAL_MONO = \
    range(7)

_HIST_ENERGIES = [10.0 ** ((i / 10.0 - 69.95 + 0.691) / 10.0)
                  for i in range(1000)]
_HIST_BOUNDARIES = [10.0 ** ((-70.0 + 0.691) / 10.0)] + \
    [10.0 ** ((i / 10.0 - 70.0 + 0.691) / 10.0) for i in range(1, 1001)]


def _find_hist(energy):
    lo, hi = 0, 1000
    while hi - lo != 1:
        mid = (lo + hi) // 2
        if energy >= _HIST_BOUNDARIES[mid]:
            lo = mid
        else:
            hi = mid
    return lo


class OracleEbur:
    def __init__(self, channels, rate, dual_mono=False):
        self.channels = channels
        self.rate = rate
        self.samples_in_100ms = (rate + 5) // 10
        frames = rate * 3000 // 1000
        if frames % self.samples_in_100ms:
            frames += self.samples_in_100ms - frames % self.samples_in_100ms
        self.audio_data = [0.0] * (frames * channels)
        self.audio_data_frames = frames
        self.audio_data_index = 0           # in doubles, like the C
        self.needed_frames = self.samples_in_100ms * 4
        self.st_counter = 0
        self.block_hist = [0] * 1000
        self.st_hist = [0] * 1000
        self.sample_peak = [0.0] * channels
        if channels == 4:
            self.cmap = [LEFT, RIGHT, LEFT_SURROUND, RIGHT_SURROUND]
        elif channels == 5:
            self.cmap = [LEFT, RIGHT, CENTER, LEFT_SURROUND,
                         RIGHT_SURROUND]
        else:
            base = [LEFT, RIGHT, CENTER, UNUSED, LEFT_SURROUND,
                    RIGHT_SURROUND]
            self.cmap = [base[i] if i < 6 else UNUSED
                         for i in range(channels)]
        if dual_mono:
            self.cmap[0] = DUAL_MONO
        # filter design (ebur128.c:106-147)
        f0, G, Q = 1681.974450955533, 3.999843853973347, 0.7071752369554196
        K = math.tan(math.pi * f0 / rate)
        Vh = 10.0 ** (G / 20.0)
        Vb = Vh ** 0.4996667741545416
        a0 = 1.0 + K / Q + K * K
        pb = [(Vh + Vb * K / Q + K * K) / a0, 2.0 * (K * K - Vh) / a0,
              (Vh - Vb * K / Q + K * K) / a0]
        pa = [1.0, 2.0 * (K * K - 1.0) / a0, (1.0 - K / Q + K * K) / a0]
        rb = [1.0, -2.0, 1.0]
        f0, Q = 38.13547087602444, 0.5003270373238773
        K = math.tan(math.pi * f0 / rate)
        ra = [1.0, 2.0 * (K * K - 1.0) / (1.0 + K / Q + K * K),
              (1.0 - K / Q + K * K) / (1.0 + K / Q + K * K)]
        self.b = [pb[0] * rb[0], pb[0] * rb[1] + pb[1] * rb[0],
                  pb[0] * rb[2] + pb[1] * rb[1] + pb[2] * rb[0],
                  pb[1] * rb[2] + pb[2] * rb[1], pb[2] * rb[2]]
        self.a = [pa[0] * ra[0], pa[0] * ra[1] + pa[1] * ra[0],
                  pa[0] * ra[2] + pa[1] * ra[1] + pa[2] * ra[0],
                  pa[1] * ra[2] + pa[2] * ra[1], pa[2] * ra[2]]
        self.v = [[0.0] * 5 for _ in range(5)]
        self.dbl_min = np.finfo(np.float64).tiny

    def _filter(self, src, src_index, frames):
        """ebur128.c:317-365; src flat interleaved, src_index in
        doubles."""
        ch = self.channels
        for c in range(ch):
            mx = 0.0
            for i in range(frames):
                v = src[src_index + i * ch + c]
                if v > mx:
                    mx = v
                elif -v > mx:
                    mx = -v
            if mx > self.sample_peak[c]:
                self.sample_peak[c] = mx
        base = self.audio_data_index
        for c in range(ch):
            ci = self.cmap[c] - 1
            if ci < 0:
                continue
            if ci == DUAL_MONO - 1:
                ci = 0
            v = self.v[ci]
            a, b = self.a, self.b
            for i in range(frames):
                x = src[src_index + i * ch + c]
                v0 = x - a[1] * v[1] - a[2] * v[2] - a[3] * v[3] \
                    - a[4] * v[4]
                v[0] = v0
                self.audio_data[base + i * ch + c] = (
                    b[0] * v[0] + b[1] * v[1] + b[2] * v[2]
                    + b[3] * v[3] + b[4] * v[4])
                v[4], v[3], v[2], v[1] = v[3], v[2], v[1], v[0]
            for k in (1, 2, 3, 4):
                if abs(v[k]) < self.dbl_min:
                    v[k] = 0.0

    def _gating_block(self, frames_per_block):
        """ebur128.c:391-443."""
        ch = self.channels
        total = 0.0
        for c in range(ch):
            if self.cmap[c] == UNUSED:
                continue
            s = 0.0
            idx_f = self.audio_data_index // ch
            if self.audio_data_index < frames_per_block * ch:
                for i in range(idx_f):
                    s += self.audio_data[i * ch + c] ** 2
                for i in range(self.audio_data_frames
                               - (frames_per_block - idx_f),
                               self.audio_data_frames):
                    s += self.audio_data[i * ch + c] ** 2
            else:
                for i in range(idx_f - frames_per_block, idx_f):
                    s += self.audio_data[i * ch + c] ** 2
            if self.cmap[c] in (LEFT_SURROUND, RIGHT_SURROUND):
                s *= 1.41
            elif self.cmap[c] == DUAL_MONO:
                s *= 2.0
            total += s
        return total / frames_per_block

    def add_frames(self, x):
        """x: (n, ch) float64."""
        src = np.asarray(x, np.float64).reshape(-1).tolist()
        ch = self.channels
        src_index = 0
        frames = len(x)
        while frames > 0:
            if frames >= self.needed_frames:
                self._filter(src, src_index, self.needed_frames)
                src_index += self.needed_frames * ch
                frames -= self.needed_frames
                self.audio_data_index += self.needed_frames * ch
                e = self._gating_block(self.samples_in_100ms * 4)
                if e >= _HIST_BOUNDARIES[0]:
                    self.block_hist[_find_hist(e)] += 1
                self.st_counter += self.needed_frames
                if self.st_counter == self.samples_in_100ms * 30:
                    e = self._gating_block(self.samples_in_100ms * 30)
                    if e >= _HIST_BOUNDARIES[0]:
                        self.st_hist[_find_hist(e)] += 1
                    self.st_counter = self.samples_in_100ms * 20
                self.needed_frames = self.samples_in_100ms
                if self.audio_data_index == self.audio_data_frames * ch:
                    self.audio_data_index = 0
            else:
                self._filter(src, src_index, frames)
                self.audio_data_index += frames * ch
                self.st_counter += frames
                self.needed_frames -= frames
                frames = 0

    @staticmethod
    def _e2l(e):
        return 10.0 * math.log10(e) - 0.691

    def relative_threshold(self):
        rt, cnt = 0.0, 0
        for j in range(1000):
            rt += self.block_hist[j] * _HIST_ENERGIES[j]
            cnt += self.block_hist[j]
        if cnt == 0:
            return -70.0
        return self._e2l(rt / cnt * 10.0 ** (-10.0 / 10.0))

    def loudness_global(self):
        rt, cnt = 0.0, 0
        for j in range(1000):
            rt += self.block_hist[j] * _HIST_ENERGIES[j]
            cnt += self.block_hist[j]
        if cnt == 0:
            return float("-inf")
        rt = rt / cnt * 10.0 ** (-10.0 / 10.0)
        if rt < _HIST_BOUNDARIES[0]:
            start = 0
        else:
            start = _find_hist(rt)
            if rt > _HIST_ENERGIES[start]:
                start += 1
        g, cnt = 0.0, 0
        for j in range(start, 1000):
            g += self.block_hist[j] * _HIST_ENERGIES[j]
            cnt += self.block_hist[j]
        if cnt == 0:
            return float("-inf")
        return self._e2l(g / cnt)

    def loudness_shortterm(self):
        e = self._gating_block(self.samples_in_100ms * 30)
        if e <= 0.0:
            return float("-inf")
        return self._e2l(e)

    def loudness_range(self):
        stl_size, stl_power = 0, 0.0
        for j in range(1000):
            stl_size += self.st_hist[j]
            stl_power += self.st_hist[j] * _HIST_ENERGIES[j]
        if not stl_size:
            return 0.0
        stl_power /= stl_size
        sti = 10.0 ** (-20.0 / 10.0) * stl_power
        if sti < _HIST_BOUNDARIES[0]:
            index = 0
        else:
            index = _find_hist(sti)
            if sti > _HIST_ENERGIES[index]:
                index += 1
        stl_size = sum(self.st_hist[index:])
        if not stl_size:
            return 0.0
        p_low = int((stl_size - 1) * 0.1 + 0.5)
        p_high = int((stl_size - 1) * 0.95 + 0.5)
        size, j = 0, index
        while size <= p_low:
            size += self.st_hist[j]
            j += 1
        l_en = _HIST_ENERGIES[j - 1]
        while size <= p_high:
            size += self.st_hist[j]
            j += 1
        h_en = _HIST_ENERGIES[j - 1]
        return self._e2l(h_en) - self._e2l(l_en)


# ---------------------------------------------------------------------------
# loudnorm (literal; af_loudnorm.c)

OUT, ATTACK, SUSTAIN, RELEASE = range(4)
FIRST_FRAME, INNER_FRAME, FINAL_FRAME, LINEAR_MODE = range(4)


class OracleLoudnorm:
    """Feed full frames at the processing rate via filter_frame();
    drive framing externally like the test harness does."""

    def __init__(self, rate, channels, target_i=-24.0, target_lra=7.0,
                 target_tp=-2.0, measured_i=0.0, measured_lra=0.0,
                 measured_tp=99.0, measured_thresh=-70.0, offset=0.0,
                 linear=True, dual_mono=False):
        self.rate, self.channels = rate, channels
        self.target_i, self.target_lra = target_i, target_lra
        self.measured_i, self.measured_lra = measured_i, measured_lra
        self.measured_tp, self.measured_thresh = \
            measured_tp, measured_thresh
        self.frame_type = FIRST_FRAME
        self.offset = offset
        if linear and measured_tp != 99 and measured_thresh != -70 \
                and measured_lra != 0 and measured_i != 0:
            off = target_i - measured_i
            if (measured_tp + off <= target_tp
                    and measured_lra <= target_lra):
                self.frame_type = LINEAR_MODE
                self.offset = off
        # config_input (:718-770)
        ch = channels
        self.r128_in = OracleEbur(ch, rate, dual_mono and ch == 1)
        self.r128_out = OracleEbur(ch, rate, dual_mono and ch == 1)
        self.buf_size = frame_size(rate, 3000) * ch
        self.buf = [0.0] * self.buf_size
        self.limiter_buf_size = frame_size(rate, 210) * ch
        self.limiter_buf = [0.0] * self.limiter_buf_size
        self.prev_smp = [0.0] * ch
        sigma, off21 = 3.5, 10
        w = [1.0 / (sigma * math.sqrt(2.0 * math.pi))
             * math.exp(-((i - off21) ** 2.0) / (2.0 * sigma ** 2.0))
             for i in range(21)]
        tw = sum(w)
        self.weights = [x / tw for x in w]
        self.buf_index = self.prev_buf_index = self.limiter_buf_index = 0
        self.delta = [0.0] * 30
        self.prev_delta = 0.0
        self.index = 1
        self.limiter_state = OUT
        self.gain_reduction = [0.0, 0.0]
        self.peak_index = self.env_index = self.env_cnt = 0
        self.offset = 10.0 ** (self.offset / 20.0)
        self.target_tp = 10.0 ** (target_tp / 20.0)
        self.attack_length = frame_size(rate, 10)
        self.release_length = frame_size(rate, 100)
        self.above_threshold = 0
        self.prev_nb_samples = 0

    def _gaussian(self, index):
        index = index - 10 if index - 10 > 0 else index + 20
        r = 0.0
        for i in range(21):
            r += self.delta[(index + i) if (index + i) < 30
                            else (index + i - 30)] * self.weights[i]
        return r

    # -- detect_peak (:167-228), literal ----------------------------------

    def _detect_peak(self, offset, nb_samples):
        ch = self.channels
        buf, size = self.limiter_buf, self.limiter_buf_size
        ceiling = self.target_tp
        index = self.limiter_buf_index + offset * ch + 1920 * ch
        if index >= size:
            index -= size
        if self.frame_type == FIRST_FRAME:
            for c in range(ch):
                self.prev_smp[c] = abs(buf[index + c - ch])
        n = 0
        while n < nb_samples:
            c = 0
            while c < ch:
                this = abs(buf[index + c if index + c < size
                               else index + c - size])
                nxt = abs(buf[index + c + ch if index + c + ch < size
                              else index + c + ch - size])
                if (self.prev_smp[c] <= this and nxt <= this
                        and this > ceiling and n > 0):
                    detected = True
                    for i in range(2, 12):
                        nxt = abs(buf[(index + c + i * ch) % size])
                        if nxt > this:
                            detected = False
                            break
                    if detected:
                        max_peak = 0.0
                        for c2 in range(ch):
                            v = abs(buf[(index + c2) % size])
                            if c2 == 0 or v > max_peak:
                                max_peak = v
                            self.prev_smp[c2] = v
                        self.peak_index = index
                        return n, max_peak
                    # failed candidate: prev_smp NOT updated (:205-206)
                else:
                    self.prev_smp[c] = this
                c += 1
            index += ch
            if index >= size:
                index -= size
            n += 1
        return -1, 0.0

    # -- true_peak_limiter (:230-407), literal -----------------------------

    def _limit(self, nb_samples):
        ch = self.channels
        buf, size = self.limiter_buf, self.limiter_buf_size
        ceiling = self.target_tp
        index = self.limiter_buf_index
        smp_cnt = 0
        if self.frame_type == FIRST_FRAME:
            mx = 0.0
            for n in range(1920):
                for c in range(ch):
                    v = abs(buf[n * ch + c])
                    if v > mx:
                        mx = v
            if mx > ceiling:
                self.gain_reduction[1] = ceiling / mx
                self.limiter_state = SUSTAIN
                for n in range(1920):
                    for c in range(ch):
                        buf[n * ch + c] *= self.gain_reduction[1]
        while True:
            if self.limiter_state == OUT:
                pd, pv = self._detect_peak(smp_cnt, nb_samples - smp_cnt)
                if pd != -1:
                    self.env_cnt = 0
                    smp_cnt += pd - self.attack_length
                    self.gain_reduction[0] = 1.0
                    self.gain_reduction[1] = ceiling / pv
                    self.limiter_state = ATTACK
                    ei = self.peak_index - self.attack_length * ch
                    if ei < 0:
                        ei += size
                    ei += self.env_cnt * ch
                    if ei > size:
                        ei -= size
                    self.env_index = ei
                else:
                    smp_cnt = nb_samples
            elif self.limiter_state == ATTACK:
                while self.env_cnt < self.attack_length:
                    for c in range(ch):
                        env = self.gain_reduction[0] - (
                            self.env_cnt / (self.attack_length - 1)
                            * (self.gain_reduction[0]
                               - self.gain_reduction[1]))
                        buf[self.env_index + c] *= env
                    self.env_index += ch
                    if self.env_index >= size:
                        self.env_index -= size
                    smp_cnt += 1
                    if smp_cnt >= nb_samples:
                        self.env_cnt += 1
                        break
                    self.env_cnt += 1
                else:
                    self.env_cnt = self.attack_length
                if smp_cnt < nb_samples:
                    self.env_cnt = 0
                    self.attack_length = 1920
                    self.limiter_state = SUSTAIN
            elif self.limiter_state == SUSTAIN:
                pd, pv = self._detect_peak(smp_cnt, nb_samples)
                if pd == -1:
                    self.limiter_state = RELEASE
                    self.gain_reduction[0] = self.gain_reduction[1]
                    self.gain_reduction[1] = 1.0
                    self.env_cnt = 0
                else:
                    gr = ceiling / pv
                    if gr < self.gain_reduction[1]:
                        self.limiter_state = ATTACK
                        self.attack_length = pd
                        if self.attack_length <= 1:
                            self.attack_length = 2
                        self.gain_reduction[0] = self.gain_reduction[1]
                        self.gain_reduction[1] = gr
                        self.env_cnt = 0
                    else:
                        self.env_cnt = 0
                        while self.env_cnt < pd:
                            for c in range(ch):
                                buf[self.env_index + c] *= \
                                    self.gain_reduction[1]
                            self.env_index += ch
                            if self.env_index >= size:
                                self.env_index -= size
                            smp_cnt += 1
                            if smp_cnt >= nb_samples:
                                self.env_cnt += 1
                                break
                            self.env_cnt += 1
            elif self.limiter_state == RELEASE:
                while self.env_cnt < self.release_length:
                    for c in range(ch):
                        env = self.gain_reduction[0] + (
                            self.env_cnt / (self.release_length - 1)
                            * (self.gain_reduction[1]
                               - self.gain_reduction[0]))
                        buf[self.env_index + c] *= env
                    self.env_index += ch
                    if self.env_index >= size:
                        self.env_index -= size
                    smp_cnt += 1
                    if smp_cnt >= nb_samples:
                        self.env_cnt += 1
                        break
                    self.env_cnt += 1
                else:
                    self.env_cnt = self.release_length
                if smp_cnt < nb_samples:
                    self.env_cnt = 0
                    self.limiter_state = OUT
            if smp_cnt >= nb_samples:
                break
        out = [0.0] * (nb_samples * ch)
        for n in range(nb_samples):
            for c in range(ch):
                v = buf[index + c]
                if abs(v) > ceiling:
                    v = ceiling * (-1 if v < 0 else 1)
                out[n * ch + c] = v
            index += ch
            if index >= size:
                index -= size
        return out

    # -- filter_frame (:409-637) -------------------------------------------

    def filter_frame(self, src):
        """src: (n, ch) float64 frame at the processing rate; returns
        the (m, ch) float64 output."""
        ch = self.channels
        n = len(src)
        flat = np.asarray(src, np.float64).reshape(-1).tolist()
        self.r128_in.add_frames(src)

        if self.frame_type == FIRST_FRAME and \
                n < frame_size(self.rate, 3000):
            glob = self.r128_in.loudness_global()
            true_peak = 0.0
            for c in range(ch):
                tmp = self.r128_in.sample_peak[c]
                if c == 0 or tmp > true_peak:
                    true_peak = tmp
            off = 10.0 ** ((self.target_i - glob) / 20.0)
            offset_tp = true_peak * off
            self.offset = off if offset_tp < self.target_tp \
                else self.target_tp - true_peak
            self.frame_type = LINEAR_MODE

        if self.frame_type == FIRST_FRAME:
            for i in range(n * ch):
                self.buf[self.buf_index + i] = flat[i]
            self.buf_index += n * ch
            shortterm = self.r128_in.loudness_shortterm()
            if shortterm < self.measured_thresh:
                self.above_threshold = 0
                env_shortterm = 0.0 if shortterm <= -70 \
                    else self.target_i - self.measured_i
            else:
                self.above_threshold = 1
                env_shortterm = 0.0 if shortterm <= -70 \
                    else self.target_i - shortterm
            for i in range(30):
                self.delta[i] = 10.0 ** (env_shortterm / 20.0)
            self.prev_delta = self.delta[self.index]
            self.buf_index = self.limiter_buf_index = 0
            for i in range(self.limiter_buf_size // ch):
                for c in range(ch):
                    self.limiter_buf[self.limiter_buf_index + c] = \
                        self.buf[self.buf_index + c] \
                        * self.delta[self.index] * self.offset
                self.limiter_buf_index += ch
                if self.limiter_buf_index >= self.limiter_buf_size:
                    self.limiter_buf_index -= self.limiter_buf_size
                self.buf_index += ch
            subframe = frame_size(self.rate, 100)
            out = self._limit(subframe)
            self.frame_type = INNER_FRAME
            self.r128_out.add_frames(
                np.array(out).reshape(-1, ch))
            return np.array(out).reshape(-1, ch)

        if self.frame_type == INNER_FRAME:
            gain = self._gaussian(self.index + 10 if self.index + 10 < 30
                                  else self.index + 10 - 30)
            gain_next = self._gaussian(
                self.index + 11 if self.index + 11 < 30
                else self.index + 11 - 30)
            si = 0
            for i in range(n):
                for c in range(ch):
                    self.buf[self.prev_buf_index + c] = flat[si + c]
                    self.limiter_buf[self.limiter_buf_index + c] = \
                        self.buf[self.buf_index + c] \
                        * (gain + (i / n) * (gain_next - gain)) \
                        * self.offset
                si += ch
                self.limiter_buf_index += ch
                if self.limiter_buf_index >= self.limiter_buf_size:
                    self.limiter_buf_index -= self.limiter_buf_size
                self.prev_buf_index += ch
                if self.prev_buf_index >= self.buf_size:
                    self.prev_buf_index -= self.buf_size
                self.buf_index += ch
                if self.buf_index >= self.buf_size:
                    self.buf_index -= self.buf_size
            subframe = (frame_size(self.rate, 100) - n) * ch
            self.limiter_buf_index = \
                self.limiter_buf_index + subframe \
                if self.limiter_buf_index + subframe \
                < self.limiter_buf_size \
                else self.limiter_buf_index + subframe \
                - self.limiter_buf_size
            out = self._limit(n)
            dst = np.array(out).reshape(-1, ch)
            self.r128_out.add_frames(dst)

            lra = self.r128_in.loudness_range()
            glob = self.r128_in.loudness_global()
            shortterm = self.r128_in.loudness_shortterm()
            rel = self.r128_in.relative_threshold()
            if self.above_threshold == 0:
                if shortterm > self.measured_thresh:
                    self.prev_delta *= 1.0058
                if self.r128_out.loudness_shortterm() >= self.target_i:
                    self.above_threshold = 1
            if shortterm < rel or shortterm <= -70.0 \
                    or self.above_threshold == 0:
                self.delta[self.index] = self.prev_delta
            else:
                eg = shortterm - glob \
                    if abs(shortterm - glob) < self.target_lra / 2.0 \
                    else (self.target_lra / 2.0) \
                    * (-1 if shortterm - glob < 0 else 1)
                es = self.target_i - shortterm
                self.delta[self.index] = 10.0 ** ((eg + es) / 20.0)
            self.prev_delta = self.delta[self.index]
            self.index += 1
            if self.index >= 30:
                self.index -= 30
            self.prev_nb_samples = n
            del lra
            return dst

        if self.frame_type == FINAL_FRAME:
            gain = self._gaussian(self.index + 10 if self.index + 10 < 30
                                  else self.index + 10 - 30)
            self.limiter_buf_index = 0
            src_index = 0
            for i in range(self.limiter_buf_size // ch):
                for c in range(ch):
                    self.limiter_buf[self.limiter_buf_index + c] = \
                        flat[src_index + c] * gain * self.offset
                src_index += ch
                self.limiter_buf_index += ch
                if self.limiter_buf_index >= self.limiter_buf_size:
                    self.limiter_buf_index -= self.limiter_buf_size
            subframe = frame_size(self.rate, 100)
            outs = []
            for _ in range(n // subframe):
                outs.extend(self._limit(subframe))
                for i in range(subframe):
                    for c in range(ch):
                        if src_index < n * ch:
                            self.limiter_buf[self.limiter_buf_index
                                             + c] = flat[src_index + c] \
                                * gain * self.offset
                        else:
                            self.limiter_buf[self.limiter_buf_index
                                             + c] = 0.0
                    if src_index < n * ch:
                        src_index += ch
                    self.limiter_buf_index += ch
                    if self.limiter_buf_index >= self.limiter_buf_size:
                        self.limiter_buf_index -= self.limiter_buf_size
            dst = np.array(outs).reshape(-1, ch)
            self.r128_out.add_frames(dst)
            return dst

        # LINEAR_MODE
        dst = np.asarray(src, np.float64) * self.offset
        self.r128_out.add_frames(dst)
        return dst

    def eof_drain(self):
        """request_frame EOF path (:639-682); returns the FINAL output
        or None when not applicable."""
        if self.frame_type != INNER_FRAME:
            return None
        ch = self.channels
        nb = (self.buf_size // ch - self.prev_nb_samples) \
            - (frame_size(self.rate, 100) - self.prev_nb_samples)
        off = ((self.limiter_buf_size // ch - self.prev_nb_samples)
               - (frame_size(self.rate, 100) - self.prev_nb_samples)) * ch
        self.buf_index = self.buf_index - off + self.buf_size \
            if self.buf_index - off < 0 else self.buf_index - off
        frame = [0.0] * (nb * ch)
        for i in range(nb):
            for c in range(ch):
                frame[i * ch + c] = self.buf[self.buf_index + c]
            self.buf_index += ch
            if self.buf_index >= self.buf_size:
                self.buf_index -= self.buf_size
        self.frame_type = FINAL_FRAME
        return self.filter_frame(np.array(frame).reshape(-1, ch))
