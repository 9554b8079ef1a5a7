// Host DSP kernels for gmat_tpu's audio filter chain.
//
// Biquad direct-form-I s16 lane for the af_biquads filter family
// rebuild (av/biquads.py).  The recurrence, state handling (double
// i1/i2/o1/o2 carried UNCLIPPED across blocks), the o2/o1 ping-pong
// unroll, wet/dry mix, clip counting and the double->int16 truncating
// store reproduce libavfilter's BIQUAD_FILTER(s16) semantics
// (af_biquads.c:205-283) exactly — C arithmetic in the same
// association order is the whole point of doing this in C.

#include <cstdint>

#define GDSP_API extern "C" __attribute__((visibility("default")))

GDSP_API void gdsp_biquad_di_s16(const int16_t* in, int16_t* out, int len,
                                 double* state /* i1 i2 o1 o2 */,
                                 double b0, double b1, double b2,
                                 double a1, double a2,
                                 double wet, int disabled,
                                 long long* clippings) {
    double i1 = state[0], i2 = state[1], o1 = state[2], o2 = state[3];
    const double dry = 1.0 - wet;
    double outv;
    int i;
    a1 = -a1;
    a2 = -a2;

    for (i = 0; i + 1 < len; i++) {
        o2 = i2 * b2 + i1 * b1 + in[i] * b0 + o2 * a2 + o1 * a1;
        i2 = in[i];
        outv = o2 * wet + i2 * dry;
        if (disabled) {
            out[i] = (int16_t)i2;
        } else if (outv < -32768.0) {
            (*clippings)++;
            out[i] = -32768;
        } else if (outv > 32767.0) {
            (*clippings)++;
            out[i] = 32767;
        } else {
            out[i] = (int16_t)outv;
        }
        i++;
        o1 = i1 * b2 + i2 * b1 + in[i] * b0 + o1 * a2 + o2 * a1;
        i1 = in[i];
        outv = o1 * wet + i1 * dry;
        if (disabled) {
            out[i] = (int16_t)i1;
        } else if (outv < -32768.0) {
            (*clippings)++;
            out[i] = -32768;
        } else if (outv > 32767.0) {
            (*clippings)++;
            out[i] = 32767;
        } else {
            out[i] = (int16_t)outv;
        }
    }
    if (i < len) {
        double o0 = in[i] * b0 + i1 * b1 + i2 * b2 + o1 * a1 + o2 * a2;
        i2 = i1;
        i1 = in[i];
        o2 = o1;
        o1 = o0;
        outv = o0 * wet + i1 * dry;
        if (disabled) {
            out[i] = (int16_t)i1;
        } else if (outv < -32768.0) {
            (*clippings)++;
            out[i] = -32768;
        } else if (outv > 32767.0) {
            (*clippings)++;
            out[i] = 32767;
        } else {
            out[i] = (int16_t)outv;
        }
    }
    state[0] = i1;
    state[1] = i2;
    state[2] = o1;
    state[3] = o2;
}
