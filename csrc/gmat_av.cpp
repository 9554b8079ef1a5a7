// gmat_av.cpp — native host runtime for gmat_tpu.
//
// TPU rebuild of the reference's host-side stack:
//   * Demuxer        <- metrans AvToolkit Demuxer (Demuxer.h:16-221):
//                       file/memory open, annexb BSF, A/V split, seek.
//   * Decoder        <- NvDecLite's role (NvDecLite.cpp) but via libavcodec
//                       software decode (no fixed-function decoder on TPU
//                       hosts); planar I420 output straight into caller
//                       (numpy) buffers.
//   * Encoder        <- NvEncLite / NvEncLiteUnbuffered (NvEncLite*.cpp):
//                       libx264/libx265/mjpeg with GOP/bitrate/preset/CQP
//                       and stillImage mode (GOP=1, no B-frames).
//   * Muxer          <- AvToolkit Muxer/LazyMuxer (Muxer.h:15-229).
//   * NAL inspection <- FrameExtractor's H.264 non-ref detect
//                       (FrameExtractor.h:44-51) + HEVC *_N sub-layer
//                       non-ref types (HevcParser subset).
//
// Pure C ABI; bound from Python with ctypes (metrans python bindings style,
// CFrameExtractor.cpp:6-51).  All potentially-slow calls release the GIL by
// construction (ctypes does this for us).

extern "C" {
#include <libavformat/avformat.h>
#include <libavcodec/avcodec.h>
#include <libavcodec/bsf.h>
#include <libavutil/imgutils.h>
#include <libavutil/mastering_display_metadata.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
#include <libswscale/swscale.h>
}

#include <cstring>
#include <string>
#include <vector>

#define GAV_API extern "C" __attribute__((visibility("default")))

// thread_local: decoder/encoder sessions run on worker threads (metrans
// EncoderWorker, ingest prefetch, shm workers) with the GIL released —
// a shared buffer would race and report another session's error
static thread_local char g_err[1024];
static void set_err(const char* where, int code) {
    char buf[256];
    av_strerror(code, buf, sizeof buf);
    snprintf(g_err, sizeof g_err, "%s: %s (%d)", where, buf, code);
}
GAV_API const char* gav_last_error() { return g_err; }

// ---------------------------------------------------------------- demuxer
struct GavBufIO {                      // memory-buffer input state
    const uint8_t* data;
    int64_t size;
    int64_t pos;
};

struct GavDemuxer {
    AVFormatContext* fmt = nullptr;
    AVBSFContext* bsf = nullptr;       // annexb conversion for h264/hevc
    bool avcc = false;                 // keep_avcc on an avcC/hvcC stream
    AVPacket* pkt = nullptr;
    AVPacket* out = nullptr;
    AVIOContext* avio = nullptr;       // set for memory-buffer inputs
    GavBufIO* bufio = nullptr;
    int vstream = -1;
    int astream = -1;
    bool eof = false;
};

// custom AVIO callbacks over a caller-owned buffer (zero-copy, like the
// reference Demuxer(uint8_t* pBuffer, size_t) ctor, Demuxer.h:20-61)
static int gav_bufio_read(void* opaque, uint8_t* buf, int buf_size) {
    auto* b = (GavBufIO*)opaque;
    int64_t left = b->size - b->pos;
    if (left <= 0) return AVERROR_EOF;
    int n = (int)(buf_size < left ? buf_size : left);
    memcpy(buf, b->data + b->pos, n);
    b->pos += n;
    return n;
}

static int64_t gav_bufio_seek(void* opaque, int64_t offset, int whence) {
    auto* b = (GavBufIO*)opaque;
    whence &= ~AVSEEK_FORCE;
    if (whence == AVSEEK_SIZE) return b->size;
    int64_t base = whence == SEEK_SET ? 0 :
                   whence == SEEK_CUR ? b->pos : b->size;
    int64_t np = base + offset;
    if (np < 0 || np > b->size) return AVERROR(EINVAL);
    b->pos = np;
    return np;
}

static void demux_free(GavDemuxer* d) {
    av_packet_free(&d->pkt);
    av_packet_free(&d->out);
    if (d->bsf) av_bsf_free(&d->bsf);
    avformat_close_input(&d->fmt);
    if (d->avio) {
        av_freep(&d->avio->buffer);
        avio_context_free(&d->avio);
    }
    delete d->bufio;
    delete d;
}

// shared tail of both open paths: stream probe + annexb BSF + packet alloc
// keep_avcc skips the mp4toannexb BSF (the reference Demuxer's bKeepAvcc,
// Demuxer.h:58 — required for stream-copy remux into mp4/mov)
static void* demux_finish(GavDemuxer* d, int keep_avcc) {
    int r = avformat_find_stream_info(d->fmt, nullptr);
    if (r < 0) { set_err("find_stream_info", r); demux_free(d); return nullptr; }
    d->vstream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    d->astream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    // audio-only containers are valid sources (the reference Demuxer's
    // (path, bVideo=false, bAudio=true) form, Demuxer.h:16-61)
    if (d->vstream < 0 && d->astream < 0) { snprintf(g_err, sizeof g_err, "no video or audio stream"); demux_free(d); return nullptr; }
    AVCodecParameters* par = d->vstream >= 0 ? d->fmt->streams[d->vstream]->codecpar : nullptr;
    const char* bsf_name = nullptr;
    if (!keep_avcc && par && par->codec_id == AV_CODEC_ID_H264) bsf_name = "h264_mp4toannexb";
    else if (!keep_avcc && par && par->codec_id == AV_CODEC_ID_HEVC) bsf_name = "hevc_mp4toannexb";
    // keep_avcc on an avcC/hvcC-configured stream: packets stay
    // length-prefixed (first extradata byte 1 = configurationVersion)
    d->avcc = keep_avcc && par &&
              (par->codec_id == AV_CODEC_ID_H264 ||
               par->codec_id == AV_CODEC_ID_HEVC) &&
              par->extradata_size > 0 && par->extradata[0] == 1;
    if (bsf_name) {
        // a BSF failure must be LOUD: silently dropping it would hand
        // out AVCC packets labeled annexb and corrupt the nonref scan
        const AVBitStreamFilter* f = av_bsf_get_by_name(bsf_name);
        bool ok = f && av_bsf_alloc(f, &d->bsf) == 0;
        if (ok) {
            avcodec_parameters_copy(d->bsf->par_in, par);
            d->bsf->time_base_in = d->fmt->streams[d->vstream]->time_base;
            if (av_bsf_init(d->bsf) < 0) {
                av_bsf_free(&d->bsf); d->bsf = nullptr; ok = false;
            }
        }
        if (!ok && par->extradata_size > 0 && par->extradata[0] == 1) {
            // only fatal for true avcC/hvcC inputs; annexb sources simply
            // pass through the (absent) filter unchanged
            snprintf(g_err, sizeof g_err, "%s init failed on an "
                     "avcC/hvcC stream (malformed extradata?)", bsf_name);
            demux_free(d);
            return nullptr;
        }
    }
    d->pkt = av_packet_alloc();
    d->out = av_packet_alloc();
    return d;
}

GAV_API void* gav_demux_open(const char* path, int keep_avcc) {
    auto* d = new GavDemuxer();
    int r = avformat_open_input(&d->fmt, path, nullptr, nullptr);
    if (r < 0) { set_err("avformat_open_input", r); delete d; return nullptr; }
    return demux_finish(d, keep_avcc);
}

// Memory-buffer input (Demuxer(pBuffer, size) / FrameExtractor_InitFromBuffer
// analog, metrans/app/CFrameExtractor.cpp).  The caller keeps `data` alive
// for the demuxer's lifetime; nothing is copied.
GAV_API void* gav_demux_open_buffer(const uint8_t* data, long long size, int keep_avcc) {
    auto* d = new GavDemuxer();
    d->bufio = new GavBufIO{data, (int64_t)size, 0};
    const size_t iosz = 1 << 16;
    uint8_t* iobuf = (uint8_t*)av_malloc(iosz);
    if (!iobuf) { snprintf(g_err, sizeof g_err, "av_malloc failed"); delete d->bufio; delete d; return nullptr; }
    d->avio = avio_alloc_context(iobuf, iosz, 0, d->bufio,
                                 gav_bufio_read, nullptr, gav_bufio_seek);
    if (!d->avio) { av_free(iobuf); snprintf(g_err, sizeof g_err, "avio_alloc_context failed"); delete d->bufio; delete d; return nullptr; }
    d->fmt = avformat_alloc_context();
    if (!d->fmt) {
        snprintf(g_err, sizeof g_err, "avformat_alloc_context failed");
        av_freep(&d->avio->buffer);
        avio_context_free(&d->avio);
        delete d->bufio; delete d;
        return nullptr;
    }
    d->fmt->pb = d->avio;
    int r = avformat_open_input(&d->fmt, nullptr, nullptr, nullptr);
    if (r < 0) {
        set_err("avformat_open_input(buffer)", r);
        // open_input freed fmt on failure; avio is still ours
        av_freep(&d->avio->buffer);
        avio_context_free(&d->avio);
        delete d->bufio;
        delete d;
        return nullptr;
    }
    return demux_finish(d, keep_avcc);
}

GAV_API void gav_demux_close(void* h) {
    auto* d = (GavDemuxer*)h;
    if (!d) return;
    demux_free(d);
}

GAV_API int gav_demux_has_video(void* h) { return ((GavDemuxer*)h)->vstream >= 0; }
GAV_API int gav_demux_width(void* h)  { auto* d = (GavDemuxer*)h; return d->vstream < 0 ? 0 : d->fmt->streams[d->vstream]->codecpar->width; }
GAV_API int gav_demux_height(void* h) { auto* d = (GavDemuxer*)h; return d->vstream < 0 ? 0 : d->fmt->streams[d->vstream]->codecpar->height; }
GAV_API int gav_demux_codec(void* h) {
    if (((GavDemuxer*)h)->vstream < 0) return 99;
    switch (((GavDemuxer*)h)->fmt->streams[((GavDemuxer*)h)->vstream]->codecpar->codec_id) {
        case AV_CODEC_ID_H264: return 0;
        case AV_CODEC_ID_HEVC: return 1;
        case AV_CODEC_ID_MJPEG: return 2;
        default: return 99;
    }
}
GAV_API int gav_demux_codec_id(void* h) {
    // raw AVCodecID for codecs beyond the h264/hevc/mjpeg enum — the
    // NvDecLite codec-map analog (NvDecLite.h:112-126 supports mpeg1/2/4,
    // vc1, vp8/9, av1...; libavcodec decodes all of them in software)
    auto* d = (GavDemuxer*)h;
    return d->vstream < 0 ? 0 : (int)d->fmt->streams[d->vstream]->codecpar->codec_id;
}
GAV_API double gav_demux_fps(void* h) {
    auto* d = (GavDemuxer*)h;
    if (d->vstream < 0) return 0.0;
    AVRational r = d->fmt->streams[d->vstream]->avg_frame_rate;
    return r.den ? av_q2d(r) : 0.0;
}
GAV_API double gav_demux_duration(void* h) {
    auto* d = (GavDemuxer*)h;
    if (d->fmt->duration > 0) return d->fmt->duration / (double)AV_TIME_BASE;
    return 0.0;
}
GAV_API long long gav_demux_nb_frames(void* h) {
    auto* d = (GavDemuxer*)h;
    return d->vstream < 0 ? 0 : d->fmt->streams[d->vstream]->nb_frames;
}
// First presentation time of the video stream in SECONDS (0 when
// unknown) — TS containers start at arbitrary offsets and seek/time
// targets must compensate.
GAV_API double gav_demux_start_time(void* h) {
    auto* d = (GavDemuxer*)h;
    if (d->vstream >= 0) {
        AVStream* st = d->fmt->streams[d->vstream];
        if (st->start_time != AV_NOPTS_VALUE)
            return st->start_time * av_q2d(st->time_base);
    }
    if (d->fmt->start_time != AV_NOPTS_VALUE)
        return d->fmt->start_time / (double)AV_TIME_BASE;
    return 0.0;
}
GAV_API void gav_demux_timebase(void* h, int* num, int* den) {
    auto* d = (GavDemuxer*)h;
    // audio-only sources report the audio stream timebase so seeks work
    int si = d->vstream >= 0 ? d->vstream : d->astream;
    AVRational tb = d->fmt->streams[si]->time_base;
    *num = tb.num; *den = tb.den;
}
GAV_API int gav_demux_colorspace(void* h) {
    // 0=bt601-ish default, 1=bt709, 2=bt2020
    if (((GavDemuxer*)h)->vstream < 0) return 0;
    switch (((GavDemuxer*)h)->fmt->streams[((GavDemuxer*)h)->vstream]->codecpar->color_space) {
        case AVCOL_SPC_BT709: return 1;
        case AVCOL_SPC_BT2020_NCL: case AVCOL_SPC_BT2020_CL: return 2;
        default: return 0;
    }
}
GAV_API int gav_demux_colortrc(void* h) {
    // raw AVColorTransferCharacteristic (0 = unspecified) — the HDR
    // lane's linearize default (vf_zscale.c tin, colorspace.c:170-173)
    auto* d = (GavDemuxer*)h;
    if (d->vstream < 0) return 0;
    return (int)d->fmt->streams[d->vstream]->codecpar->color_trc;
}
GAV_API int gav_demux_colorprim(void* h) {
    // raw AVColorPrimaries (0 = unspecified/reserved)
    auto* d = (GavDemuxer*)h;
    if (d->vstream < 0) return 0;
    return (int)d->fmt->streams[d->vstream]->codecpar->color_primaries;
}
GAV_API int gav_demux_hdr(void* h, double* max_lum, int* max_cll) {
    // stream-level HDR10 static metadata: mastering-display max
    // luminance (cd/m2) + content-light MaxCLL, the inputs
    // ff_determine_signal_peak reads (colorspace.c:153-175).
    // Returns a bitmask: 1 = mastering display present, 2 = CLL present.
    auto* d = (GavDemuxer*)h;
    *max_lum = 0.0; *max_cll = 0;
    if (d->vstream < 0) return 0;
    AVStream* st = d->fmt->streams[d->vstream];
    int found = 0;
    if (uint8_t* sd = av_stream_get_side_data(
            st, AV_PKT_DATA_MASTERING_DISPLAY_METADATA, nullptr)) {
        auto* m = (AVMasteringDisplayMetadata*)sd;
        if (m->has_luminance) {
            *max_lum = av_q2d(m->max_luminance);
            found |= 1;
        }
    }
    if (uint8_t* sd = av_stream_get_side_data(
            st, AV_PKT_DATA_CONTENT_LIGHT_LEVEL, nullptr)) {
        auto* c = (AVContentLightMetadata*)sd;
        *max_cll = (int)c->MaxCLL;
        found |= 2;
    }
    return found;
}
GAV_API int gav_demux_extradata(void* h, unsigned char** data) {
    auto* d = (GavDemuxer*)h;
    if (d->vstream < 0) return 0;
    AVCodecParameters* par = d->fmt->streams[d->vstream]->codecpar;
    *data = par->extradata;
    return par->extradata_size;
}

// H.264: skippable when every VCL NAL has nal_ref_idc==0 && type==1
// (non-IDR slice) — FrameExtractor.h:44-51.  HEVC: sub-layer non-reference
// *_N types (TRAIL_N=0, TSA_N=2, STSA_N=4, RADL_N=6, RASL_N=8).
static bool packet_is_nonref(const uint8_t* p, int n, int codec) {
    int i = 0;
    bool any_vcl = false;
    while (i + 4 < n) {
        // find start code
        if (p[i] == 0 && p[i+1] == 0 && (p[i+2] == 1 || (p[i+2] == 0 && i + 5 < n && p[i+3] == 1))) {
            int off = (p[i+2] == 1) ? 3 : 4;
            const uint8_t* nal = p + i + off;
            if (codec == 0) {             // h264
                int ref_idc = (nal[0] >> 5) & 3;
                int type = nal[0] & 0x1f;
                if (type >= 1 && type <= 5) {   // VCL
                    any_vcl = true;
                    if (!(ref_idc == 0 && type == 1)) return false;
                }
            } else if (codec == 1) {      // hevc
                int type = (nal[0] >> 1) & 0x3f;
                if (type <= 31) {              // VCL
                    any_vcl = true;
                    if (!(type <= 8 && (type % 2 == 0))) return false;
                }
            }
            i += off;
        } else {
            i++;
        }
    }
    return any_vcl;
}

// returns packet size (>0), 0 on EOF, -1 error. stream_out: 0 video 1 audio.
GAV_API int gav_demux_read(void* h, unsigned char** data, long long* pts,
                           long long* dts, int* key, int* nonref,
                           int* stream_out, long long* pos) {
    auto* d = (GavDemuxer*)h;
    for (;;) {
        // drain bsf first (unref the previous output we handed the
        // caller; av_bsf_receive_packet expects a clean packet)
        if (d->bsf) {
            av_packet_unref(d->out);
            int r = av_bsf_receive_packet(d->bsf, d->out);
            if (r == 0) {
                *data = d->out->data; *pts = d->out->pts; *dts = d->out->dts;
                *key = (d->out->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
                *nonref = packet_is_nonref(d->out->data, d->out->size, gav_demux_codec(h));
                *stream_out = 0;
                if (pos) *pos = d->out->pos;
                return d->out->size;
            }
        }
        if (d->eof) return 0;
        // the previous call may have returned d->pkt's data directly
        // (non-bsf video, audio): release it before the next read —
        // av_read_frame must not receive a packet holding data
        av_packet_unref(d->out);
        av_packet_unref(d->pkt);
        int r = av_read_frame(d->fmt, d->pkt);
        if (r == AVERROR_EOF || r == AVERROR(EIO)) {
            d->eof = true;
            if (d->bsf) { av_bsf_send_packet(d->bsf, nullptr); continue; }
            return 0;
        }
        if (r < 0) { set_err("av_read_frame", r); return -1; }
        if (d->pkt->stream_index == d->vstream) {
            if (d->bsf) {
                int br_ = av_bsf_send_packet(d->bsf, d->pkt);
                if (br_ < 0) {           // a BSF failure must be LOUD
                    av_packet_unref(d->pkt);
                    set_err("bsf send", br_);
                    return -1;
                }
                continue;
            }
            *data = d->pkt->data; *pts = d->pkt->pts; *dts = d->pkt->dts;
            *key = (d->pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
            // AVCC payloads have no start codes; the annexb NAL scan
            // would misread length prefixes — stay conservative
            *nonref = d->avcc ? 0 :
                packet_is_nonref(d->pkt->data, d->pkt->size, gav_demux_codec(h));
            *stream_out = 0;
            if (pos) *pos = d->pkt->pos;
            return d->pkt->size;
        }
        if (d->pkt->stream_index == d->astream && d->astream >= 0) {
            *data = d->pkt->data; *pts = d->pkt->pts; *dts = d->pkt->dts;
            *key = 1; *nonref = 0; *stream_out = 1;
            if (pos) *pos = d->pkt->pos;
            return d->pkt->size;
        }
        av_packet_unref(d->pkt);
    }
}

// Seek to keyframe at/before ts (stream timebase units).
GAV_API int gav_demux_seek(void* h, long long ts) {
    auto* d = (GavDemuxer*)h;
    int r = av_seek_frame(d->fmt, d->vstream >= 0 ? d->vstream : d->astream,
                          ts, AVSEEK_FLAG_BACKWARD);
    if (r < 0) { set_err("av_seek_frame", r); return -1; }
    d->eof = false;
    if (d->bsf) { av_bsf_flush(d->bsf); }
    return 0;
}

// ---------------------------------------------------------------- decoder
struct GavDecoder {
    AVCodecContext* ctx = nullptr;
    AVFrame* frame = nullptr;
    SwsContext* sws = nullptr;         // only if decoder output isn't yuv420p
    int sws_w = 0, sws_h = 0;
    int sws_dw = 0, sws_dh = 0;               // destination geometry
    AVPixelFormat sws_fmt = AV_PIX_FMT_NONE;
    AVPixelFormat sws_out = AV_PIX_FMT_NONE;  // 8- vs 10-bit receive paths
    int crop_x = 0, crop_y = 0, crop_w = 0, crop_h = 0;  // 0 = no crop
    int last_interlaced = 0, last_tff = 0;    // props of the last frame
    int pending = 0;   // a received-but-unconsumed frame sits in `frame`
};


// Cached per-decoder scaler keyed on the FULL conversion (source dims/
// format AND destination dims/format — a key missing the target
// geometry would reuse a stale context and write past smaller caller
// buffers).  Full-range sources (mjpeg yuvj*/gray8) keep their range:
// sws deduces srcRange=1 but defaults the destination to limited,
// silently compressing blacks/whites — propagate the source range on
// EVERY receive path (8-bit, alpha, 10-bit).
static SwsContext* dec_get_sws(GavDecoder* d, int src_w, int src_h,
                               AVPixelFormat pf, int w, int hgt,
                               AVPixelFormat out, int keep_range = 1) {
    if (!d->sws || d->sws_w != src_w || d->sws_h != src_h ||
        d->sws_fmt != pf || d->sws_out != out ||
        d->sws_dw != w || d->sws_dh != hgt) {
        if (d->sws) sws_freeContext(d->sws);
        d->sws = sws_getContext(src_w, src_h, pf, w, hgt, out,
                                SWS_BILINEAR, nullptr, nullptr, nullptr);
        d->sws_w = src_w; d->sws_h = src_h; d->sws_fmt = pf;
        d->sws_out = out; d->sws_dw = w; d->sws_dh = hgt;
        if (d->sws && keep_range) {
            int *inv_table, *table, sr, dr, br, ct, sat;
            if (sws_getColorspaceDetails(d->sws, &inv_table, &sr, &table,
                                         &dr, &br, &ct, &sat) >= 0
                && sr && !dr)
                sws_setColorspaceDetails(d->sws, inv_table, sr, table, sr,
                                         br, ct, sat);
        }
    }
    return d->sws;
}

// Pull the next frame into d->frame (idempotent while unconsumed):
// 1 = frame held, 0 = need input, -2 = EOF, -1 = error.
static int dec_acquire(GavDecoder* d) {
    if (d->pending) return 1;
    int r = avcodec_receive_frame(d->ctx, d->frame);
    if (r == AVERROR(EAGAIN)) return 0;
    if (r == AVERROR_EOF) return -2;
    if (r < 0) { set_err("receive_frame", r); return -1; }
    d->pending = 1;
    return 1;
}

// Interlace props of the most recently received frame (AVFrame
// interlaced_frame/top_field_first) — drives yadif's deint/auto-parity.
GAV_API void gav_dec_last_frame_info(void* h, int* interlaced, int* tff) {
    auto* d = (GavDecoder*)h;
    *interlaced = d->last_interlaced;
    *tff = d->last_tff;
}

// Decoder-side crop window (NvDecLite pCropRect analog, NvDecLite.h:46,
// 107-108).  Applied before the receive-side scale; resize comes from the
// caller's buffer geometry (gav_dec_receive rescales into w x hgt) — the
// early-downscale path that shrinks frames BEFORE the H2D transfer for
// decode-bound workloads.  Coordinates must be even (4:2:0 siting).
GAV_API void gav_dec_set_crop(void* h, int x, int y, int w, int hgt) {
    auto* d = (GavDecoder*)h;
    d->crop_x = x & ~1; d->crop_y = y & ~1;
    d->crop_w = w & ~1; d->crop_h = hgt & ~1;
}

// Offset src plane pointers into the crop window for ANY planar/packed
// format the software decoders emit (8/10/16-bit, 4:2:0/4:2:2/4:4:4,
// interleaved-UV), using the pixel-format descriptor for per-plane
// chroma shifts and byte steps.  Fails loudly (rather than silently
// scaling the whole frame) for unsupported layouts or out-of-bounds rects.
static int dec_apply_crop(GavDecoder* d, const AVFrame* f,
                          const uint8_t* src[4], int* src_w, int* src_h) {
    if (d->crop_w <= 0 || d->crop_h <= 0) return 0;
    const AVPixFmtDescriptor* desc =
        av_pix_fmt_desc_get((AVPixelFormat)f->format);
    if (!desc || (desc->flags & (AV_PIX_FMT_FLAG_BITSTREAM |
                                 AV_PIX_FMT_FLAG_HWACCEL |
                                 AV_PIX_FMT_FLAG_PAL))) {
        snprintf(g_err, sizeof g_err, "decoder crop unsupported for pixel "
                 "format %s", desc ? desc->name : "?");
        return -1;
    }
    if (d->crop_x + d->crop_w > f->width ||
        d->crop_y + d->crop_h > f->height) {
        snprintf(g_err, sizeof g_err, "crop rect %dx%d+%d+%d outside "
                 "%dx%d frame", d->crop_w, d->crop_h, d->crop_x, d->crop_y,
                 f->width, f->height);
        return -1;
    }
    for (int p = 0; p < 4 && f->data[p]; p++) {
        int xs = (p == 1 || p == 2) ? desc->log2_chroma_w : 0;
        int ys = (p == 1 || p == 2) ? desc->log2_chroma_h : 0;
        int step = 1;
        for (int c = 0; c < desc->nb_components; c++)
            if (desc->comp[c].plane == p) step = desc->comp[c].step;
        src[p] = f->data[p] + (size_t)(d->crop_y >> ys) * f->linesize[p]
                 + (size_t)(d->crop_x >> xs) * step;
    }
    *src_w = d->crop_w;
    *src_h = d->crop_h;
    return 0;
}

static void* dec_create_avid(AVCodecID id, const unsigned char* extradata,
                             int extradata_size, int threads);

GAV_API void* gav_dec_create(int codec, const unsigned char* extradata,
                             int extradata_size, int threads) {
    AVCodecID id = codec == 0 ? AV_CODEC_ID_H264 :
                   codec == 1 ? AV_CODEC_ID_HEVC :
                   codec == 2 ? AV_CODEC_ID_MJPEG : AV_CODEC_ID_NONE;
    return dec_create_avid(id, extradata, extradata_size, threads);
}

// create a decoder for ANY libavcodec id (vp8/vp9/av1/mpeg2/prores/png...)
GAV_API void* gav_dec_create_id(int codec_id, const unsigned char* extradata,
                                int extradata_size, int threads) {
    return dec_create_avid((AVCodecID)codec_id, extradata, extradata_size,
                           threads);
}

static void* dec_create_avid(AVCodecID id, const unsigned char* extradata,
                             int extradata_size, int threads) {
    const AVCodec* c = avcodec_find_decoder(id);
    if (!c) { snprintf(g_err, sizeof g_err, "no decoder for codec id %d", (int)id); return nullptr; }
    auto* dec = new GavDecoder();
    dec->ctx = avcodec_alloc_context3(c);
    dec->ctx->thread_count = threads > 0 ? threads : 1;
    dec->ctx->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    if (extradata && extradata_size > 0) {
        dec->ctx->extradata = (uint8_t*)av_mallocz(extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(dec->ctx->extradata, extradata, extradata_size);
        dec->ctx->extradata_size = extradata_size;
    }
    int r = avcodec_open2(dec->ctx, c, nullptr);
    if (r < 0) { set_err("avcodec_open2", r); avcodec_free_context(&dec->ctx); delete dec; return nullptr; }
    dec->frame = av_frame_alloc();
    return dec;
}

GAV_API void gav_dec_close(void* h) {
    auto* d = (GavDecoder*)h;
    if (!d) return;
    av_frame_free(&d->frame);
    if (d->sws) sws_freeContext(d->sws);
    avcodec_free_context(&d->ctx);
    delete d;
}

GAV_API int gav_dec_send(void* h, const unsigned char* data, int size, long long pts) {
    auto* d = (GavDecoder*)h;
    int r;
    if (!data || size == 0) {
        r = avcodec_send_packet(d->ctx, nullptr);   // flush
    } else {
        AVPacket* pkt = av_packet_alloc();
        av_new_packet(pkt, size);
        memcpy(pkt->data, data, size);
        pkt->pts = pts;
        r = avcodec_send_packet(d->ctx, pkt);
        av_packet_free(&pkt);
    }
    if (r < 0 && r != AVERROR(EAGAIN) && r != AVERROR_EOF) { set_err("send_packet", r); return -1; }
    return r == AVERROR(EAGAIN) ? 1 : 0;
}

// re-arm after a drain: avcodec_flush_buffers exits the draining state,
// so one decoder instance can decode many independent stills
GAV_API void gav_dec_reset(void* h) {
    auto* d = (GavDecoder*)h;
    if (d->pending) { av_frame_unref(d->frame); d->pending = 0; }
    avcodec_flush_buffers(d->ctx);
}

GAV_API int gav_dec_width(void* h)  { return ((GavDecoder*)h)->ctx->width; }
GAV_API int gav_dec_height(void* h) { return ((GavDecoder*)h)->ctx->height; }

// Peek the NEXT frame's output dimensions (post-crop) without consuming
// it, so callers size their buffers to the actual frame — otherwise a
// mid-stream resolution change rescales the transition frame into the
// stale geometry (the receive path converts into caller buffers).
// Returns 1 = dims written (frame held until the next receive),
// 0 = need more input, -2 = EOF, -1 = error.
GAV_API int gav_dec_peek_dims(void* h, int* w, int* hgt) {
    auto* d = (GavDecoder*)h;
    int r = dec_acquire(d);
    if (r != 1) return r;
    if (d->crop_w > 0 && d->crop_h > 0 &&
        d->crop_x + d->crop_w <= d->frame->width &&
        d->crop_y + d->crop_h <= d->frame->height) {
        *w = d->crop_w; *hgt = d->crop_h;
    } else {
        *w = d->frame->width; *hgt = d->frame->height;
    }
    return 1;
}

// Receive one frame as planar I420 into caller buffers.
// Returns 1 = frame written, 0 = need more input, -2 = EOF, -1 = error.
GAV_API int gav_dec_receive(void* h, unsigned char* y, unsigned char* u,
                            unsigned char* v, int w, int hgt, long long* pts) {
    auto* d = (GavDecoder*)h;
    int r = dec_acquire(d);
    if (r != 1) return r;
    d->pending = 0;
    AVFrame* f = d->frame;
    *pts = f->pts != AV_NOPTS_VALUE ? f->pts : f->best_effort_timestamp;
    d->last_interlaced = f->interlaced_frame ? 1 : 0;
    d->last_tff = f->top_field_first ? 1 : 0;
    AVPixelFormat pf = (AVPixelFormat)f->format;
    // optional decoder-side crop: offset the source plane pointers
    // (pCropRect analog); src dims become the crop window
    const uint8_t* src[4] = {f->data[0], f->data[1], f->data[2], f->data[3]};
    int src_w = f->width, src_h = f->height;
    if (dec_apply_crop(d, f, src, &src_w, &src_h) < 0) {
        av_frame_unref(f);
        return -1;
    }
    // fast path only when the (cropped) dims match the caller's buffers;
    // any mismatch (mid-stream resolution change, early downscale) rides
    // the sws path, which rescales into the caller's geometry
    if ((pf == AV_PIX_FMT_YUV420P || pf == AV_PIX_FMT_YUVJ420P) &&
        src_w == w && src_h == hgt) {
        // chroma rows/strides use the I420 CEIL convention for odd dims
        // (matches both libav's plane layout and the caller's buffers;
        // a floor stride would shear every chroma row after the first)
        int cs = (w + 1) / 2, ch = (hgt + 1) / 2;
        for (int i = 0; i < hgt; i++)
            memcpy(y + (size_t)i * w, src[0] + (size_t)i * f->linesize[0], w);
        for (int i = 0; i < ch; i++) {
            memcpy(u + (size_t)i * cs, src[1] + (size_t)i * f->linesize[1], cs);
            memcpy(v + (size_t)i * cs, src[2] + (size_t)i * f->linesize[2], cs);
        }
    } else {
        // convert/scale anything else (yuv444, 10-bit, downscale target,
        // mid-stream dim change) to caller-geometry I420 via swscale
        if (!dec_get_sws(d, src_w, src_h, pf, w, hgt,
                         AV_PIX_FMT_YUV420P)) {
            snprintf(g_err, sizeof g_err, "no conversion from pixel "
                     "format %d", (int)pf);
            av_frame_unref(f);
            return -1;
        }
        // chroma strides use the I420 ceil convention: for odd targets
        // sws writes ceil(w/2) bytes per row (caller allocates ceil)
        uint8_t* dst[4] = {y, u, v, nullptr};
        int cs = (w + 1) / 2;
        int dstride[4] = {w, cs, cs, 0};
        sws_scale(d->sws, src, f->linesize, 0, src_h, dst, dstride);
    }
    av_frame_unref(f);
    return 1;
}

// Like gav_dec_receive but also emits a full-resolution alpha plane
// (YUVA420P target).  Sources without alpha get a=255 (opaque).  Unlocks
// alpha-carrying codecs (png/qtrle/prores4444/vp9-alpha) for the overlay
// second-input lane.
GAV_API int gav_dec_receive_a(void* h, unsigned char* y, unsigned char* u,
                              unsigned char* v, unsigned char* a,
                              int w, int hgt, long long* pts) {
    auto* d = (GavDecoder*)h;
    int r = dec_acquire(d);
    if (r != 1) return r;
    d->pending = 0;
    AVFrame* f = d->frame;
    *pts = f->pts != AV_NOPTS_VALUE ? f->pts : f->best_effort_timestamp;
    d->last_interlaced = f->interlaced_frame ? 1 : 0;
    d->last_tff = f->top_field_first ? 1 : 0;
    AVPixelFormat pf = (AVPixelFormat)f->format;
    const uint8_t* src[4] = {f->data[0], f->data[1], f->data[2], f->data[3]};
    int src_w = f->width, src_h = f->height;
    if (dec_apply_crop(d, f, src, &src_w, &src_h) < 0) {
        av_frame_unref(f);
        return -1;
    }
    // keep_range=0: the alpha lane feeds the overlay's LIMITED-range
    // YUV blend (ffmpeg converts PNG RGB to limited yuva420p the same
    // way); the alpha plane itself stays full-range regardless
    if (!dec_get_sws(d, src_w, src_h, pf, w, hgt,
                     AV_PIX_FMT_YUVA420P, 0)) {
        snprintf(g_err, sizeof g_err, "no alpha conversion from pixel "
                 "format %d", (int)pf);
        av_frame_unref(f);
        return -1;
    }
    uint8_t* dst[4] = {y, u, v, a};
    int cs = (w + 1) / 2;     // I420 ceil convention for odd targets
    int dstride[4] = {w, cs, cs, w};
    sws_scale(d->sws, src, f->linesize, 0, src_h, dst, dstride);
    av_frame_unref(f);
    return 1;
}

// 1 if the decoder's current pixel format carries an alpha component.
GAV_API int gav_dec_has_alpha(void* h) {
    auto* d = (GavDecoder*)h;
    const AVPixFmtDescriptor* desc =
        av_pix_fmt_desc_get(d->ctx->pix_fmt != AV_PIX_FMT_NONE
                            ? d->ctx->pix_fmt
                            : (AVPixelFormat)d->frame->format);
    return desc && (desc->flags & AV_PIX_FMT_FLAG_ALPHA) ? 1 : 0;
}

// ---------------------------------------------------------------- encoder
struct GavEncoder {
    AVCodecContext* ctx = nullptr;
    AVFrame* frame = nullptr;
    AVPacket* pkt = nullptr;
    long long in_count = 0;
    std::vector<int> roi;      // 6 ints per region: t,b,l,r,qnum,qden
};

// name: "libx264" | "libx265" | "mjpeg" (| any avcodec encoder name)
// still_image: GOP 1, no B-frames (NvEncLiteUnbuffered.cpp:75-77,113-115)
GAV_API void* gav_enc_create(const char* name, int w, int h,
                             int fps_num, int fps_den, long long bitrate,
                             int gop, int bf, const char* preset, double crf,
                             int still_image, const char* opts) {
    const AVCodec* c = avcodec_find_encoder_by_name(name);
    if (!c) { snprintf(g_err, sizeof g_err, "no encoder %s", name); return nullptr; }
    auto* e = new GavEncoder();
    e->ctx = avcodec_alloc_context3(c);
    e->ctx->width = w; e->ctx->height = h;
    e->ctx->time_base = {fps_den, fps_num};
    e->ctx->framerate = {fps_num, fps_den};
    e->ctx->pix_fmt = strcmp(name, "mjpeg") == 0 ? AV_PIX_FMT_YUVJ420P : AV_PIX_FMT_YUV420P;
    e->ctx->gop_size = still_image ? 1 : (gop > 0 ? gop : 300);  // default GOP 300 like NvEncLiteUnbuffered.cpp:111
    e->ctx->max_b_frames = still_image ? 0 : bf;
    if (bitrate > 0) e->ctx->bit_rate = bitrate;
    e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    e->ctx->thread_count = 1;
    if (preset && *preset) av_opt_set(e->ctx->priv_data, "preset", preset, 0);
    if (crf >= 0) av_opt_set_double(e->ctx->priv_data, "crf", crf, 0);
    if (strcmp(name, "mjpeg") == 0) {
        e->ctx->flags |= AV_CODEC_FLAG_QSCALE;
        e->ctx->global_quality = FF_QP2LAMBDA * (crf >= 0 ? (int)crf : 3);
        e->ctx->color_range = AVCOL_RANGE_JPEG;
    }
    if (opts && *opts) {
        AVDictionary* dict = nullptr;
        // pairs separated by ',' so values may carry ':'/'=' (x265-params)
        av_dict_parse_string(&dict, opts, "=", ",", 0);
        int r = avcodec_open2(e->ctx, c, &dict);
        av_dict_free(&dict);
        if (r < 0) { set_err("avcodec_open2(enc)", r); avcodec_free_context(&e->ctx); delete e; return nullptr; }
    } else {
        int r = avcodec_open2(e->ctx, c, nullptr);
        if (r < 0) { set_err("avcodec_open2(enc)", r); avcodec_free_context(&e->ctx); delete e; return nullptr; }
    }
    e->frame = av_frame_alloc();
    e->frame->format = e->ctx->pix_fmt;
    e->frame->width = w; e->frame->height = h;
    av_frame_get_buffer(e->frame, 0);
    e->pkt = av_packet_alloc();
    return e;
}

GAV_API void gav_enc_close(void* h) {
    auto* e = (GavEncoder*)h;
    if (!e) return;
    av_frame_free(&e->frame);
    av_packet_free(&e->pkt);
    avcodec_free_context(&e->ctx);
    delete e;
}

GAV_API int gav_enc_extradata(void* h, unsigned char** data) {
    auto* e = (GavEncoder*)h;
    *data = e->ctx->extradata;
    return e->ctx->extradata_size;
}

// Per-frame QP-offset regions — the NV_ENC_PIC_PARAMS.qpDeltaMap analog
// (AppNvEnc.cpp:92-102), expressed as AV_FRAME_DATA_REGIONS_OF_INTEREST
// which libx264/libx265 translate to per-MB/CTU QP offsets.  `rois` is
// n*6 ints (top, bottom, left, right, qoffset_num, qoffset_den); applied
// to every subsequent frame until changed; n=0 clears.
GAV_API void gav_enc_set_roi(void* h, const int* rois, int n) {
    auto* e = (GavEncoder*)h;
    e->roi.assign(rois, rois + (size_t)n * 6);
}

// attach the current ROI set as frame side data (shared by the 8-bit
// and 10-bit send paths)
static void enc_attach_roi(GavEncoder* e) {
    av_frame_remove_side_data(e->frame, AV_FRAME_DATA_REGIONS_OF_INTEREST);
    if (e->roi.empty()) return;
    int n = (int)(e->roi.size() / 6);
    AVFrameSideData* sd = av_frame_new_side_data(
        e->frame, AV_FRAME_DATA_REGIONS_OF_INTEREST,
        (size_t)n * sizeof(AVRegionOfInterest));
    if (!sd) return;
    auto* regs = (AVRegionOfInterest*)sd->data;
    for (int i = 0; i < n; i++) {
        const int* q = &e->roi[(size_t)i * 6];
        regs[i].self_size = sizeof(AVRegionOfInterest);
        regs[i].top = q[0]; regs[i].bottom = q[1];
        regs[i].left = q[2]; regs[i].right = q[3];
        regs[i].qoffset = {q[4], q[5]};
    }
}

// send one I420 frame (y/u/v NULL = flush). Returns like gav_dec_send.
GAV_API int gav_enc_send(void* h, const unsigned char* y, const unsigned char* u,
                         const unsigned char* v, long long pts, int force_key) {
    auto* e = (GavEncoder*)h;
    int r;
    if (!y) {
        r = avcodec_send_frame(e->ctx, nullptr);
    } else {
        av_frame_make_writable(e->frame);
        enc_attach_roi(e);
        int w = e->ctx->width, hh = e->ctx->height;
        for (int i = 0; i < hh; i++)
            memcpy(e->frame->data[0] + (size_t)i * e->frame->linesize[0], y + (size_t)i * w, w);
        for (int i = 0; i < hh / 2; i++) {
            memcpy(e->frame->data[1] + (size_t)i * e->frame->linesize[1], u + (size_t)i * (w / 2), w / 2);
            memcpy(e->frame->data[2] + (size_t)i * e->frame->linesize[2], v + (size_t)i * (w / 2), w / 2);
        }
        e->frame->pts = pts >= 0 ? pts : e->in_count;
        e->frame->pict_type = force_key ? AV_PICTURE_TYPE_I : AV_PICTURE_TYPE_NONE;
        if (e->ctx->flags & AV_CODEC_FLAG_QSCALE)
            e->frame->quality = e->ctx->global_quality;
        r = avcodec_send_frame(e->ctx, e->frame);
        // count only ACCEPTED frames: an EAGAIN retry after draining
        // must not skew the auto-generated pts sequence
        if (r == 0) e->in_count++;
    }
    if (r < 0 && r != AVERROR(EAGAIN) && r != AVERROR_EOF) { set_err("send_frame", r); return -1; }
    return r == AVERROR(EAGAIN) ? 1 : 0;
}

// Returns packet size (>0, *data valid until next call), 0 = need more,
// -2 = EOF (fully drained), -1 = error.
GAV_API int gav_enc_receive(void* h, unsigned char** data, long long* pts,
                            long long* dts, int* key) {
    auto* e = (GavEncoder*)h;
    av_packet_unref(e->pkt);
    int r = avcodec_receive_packet(e->ctx, e->pkt);
    if (r == AVERROR(EAGAIN)) return 0;
    if (r == AVERROR_EOF) return -2;
    if (r < 0) { set_err("receive_packet", r); return -1; }
    *data = e->pkt->data; *pts = e->pkt->pts; *dts = e->pkt->dts;
    *key = (e->pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0;
    return e->pkt->size;
}

// ---------------------------------------------------------------- muxer
struct GavMuxer {
    AVFormatContext* fmt = nullptr;
    int vstream = -1;
    AVRational enc_tb;      // encoder timebase (1/fps)
    bool header_written = false;
};

static void* mux_open_avid(const char* path, int w, int h, int fps_num,
                           int fps_den, AVCodecID id,
                           const unsigned char* extradata, int extradata_size);
static AVStream* mux_add_audio_stream(AVFormatContext* fmt, int acodec_id,
                                      int sample_rate, int channels,
                                      const unsigned char* aextra,
                                      int aextra_size);
static void* mux_finish_open(GavMuxer* m, const char* path);

GAV_API void* gav_mux_open(const char* path, int w, int h, int fps_num,
                           int fps_den, int codec /*0 h264,1 hevc,2 mjpeg*/,
                           const unsigned char* extradata, int extradata_size) {
    AVCodecID id = codec == 0 ? AV_CODEC_ID_H264 :
                   codec == 1 ? AV_CODEC_ID_HEVC : AV_CODEC_ID_MJPEG;
    return mux_open_avid(path, w, h, fps_num, fps_den, id,
                         extradata, extradata_size);
}

// mux ANY libavcodec video codec id (the reference Muxer takes generic
// AVCodecParameters, Muxer.h:51-90)
GAV_API void* gav_mux_open_id(const char* path, int w, int h, int fps_num,
                              int fps_den, int codec_id,
                              const unsigned char* extradata,
                              int extradata_size) {
    return mux_open_avid(path, w, h, fps_num, fps_den, (AVCodecID)codec_id,
                         extradata, extradata_size);
}

static void* mux_open_avid(const char* path, int w, int h, int fps_num,
                           int fps_den, AVCodecID id,
                           const unsigned char* extradata, int extradata_size) {
    auto* m = new GavMuxer();
    int r = avformat_alloc_output_context2(&m->fmt, nullptr, nullptr, path);
    if (r < 0 || !m->fmt) { set_err("alloc_output_context", r); delete m; return nullptr; }
    AVStream* st = avformat_new_stream(m->fmt, nullptr);
    if (!st) {
        snprintf(g_err, sizeof g_err, "avformat_new_stream failed");
        avformat_free_context(m->fmt); delete m; return nullptr;
    }
    st->codecpar->codec_type = AVMEDIA_TYPE_VIDEO;
    st->codecpar->codec_id = id;
    st->codecpar->width = w; st->codecpar->height = h;
    if (extradata_size > 0) {
        st->codecpar->extradata = (uint8_t*)av_mallocz(extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(st->codecpar->extradata, extradata, extradata_size);
        st->codecpar->extradata_size = extradata_size;
    }
    st->time_base = {fps_den, fps_num};
    st->avg_frame_rate = {fps_num, fps_den};
    m->enc_tb = {fps_den, fps_num};
    m->vstream = st->index;
    return mux_finish_open(m, path);
}

GAV_API int gav_mux_write(void* h, const unsigned char* data, int size,
                          long long pts, long long dts, int key) {
    auto* m = (GavMuxer*)h;
    AVPacket* pkt = av_packet_alloc();
    av_new_packet(pkt, size);
    memcpy(pkt->data, data, size);
    // AV_NOPTS_VALUE must propagate, not be rescaled into garbage
    // (elementary-stream inputs hand out NOPTS pts on B-frame streams)
    AVRational tb = m->fmt->streams[m->vstream]->time_base;
    pkt->pts = pts == AV_NOPTS_VALUE ? AV_NOPTS_VALUE
                                     : av_rescale_q(pts, m->enc_tb, tb);
    pkt->dts = dts == AV_NOPTS_VALUE ? AV_NOPTS_VALUE
                                     : av_rescale_q(dts, m->enc_tb, tb);
    pkt->stream_index = m->vstream;
    if (key) pkt->flags |= AV_PKT_FLAG_KEY;
    int r = av_interleaved_write_frame(m->fmt, pkt);
    av_packet_free(&pkt);
    if (r < 0) { set_err("write_frame", r); return -1; }
    return 0;
}

GAV_API int gav_mux_close(void* h) {
    auto* m = (GavMuxer*)h;
    if (!m) return 0;
    int r = 0;
    if (m->header_written) {
        r = av_write_trailer(m->fmt);
        if (r < 0) set_err("write_trailer", r);   // e.g. disk full
    }
    if (m->fmt && !(m->fmt->oformat->flags & AVFMT_NOFILE) && m->fmt->pb)
        avio_closep(&m->fmt->pb);
    avformat_free_context(m->fmt);
    delete m;
    return r < 0 ? -1 : 0;
}

// ------------------------------------------------------- version / caps
// resolve a codec name ("png", "vp9", ...) to its AVCodecID (0 = none)
GAV_API int gav_codec_id_by_name(const char* name) {
    const AVCodecDescriptor* d = avcodec_descriptor_get_by_name(name);
    return d ? (int)d->id : 0;
}

GAV_API int gav_has_encoder(const char* name) {
    return avcodec_find_encoder_by_name(name) != nullptr;
}
GAV_API unsigned gav_avcodec_version() { return avcodec_version(); }

// ================================================================= audio
// AudDec / AudEnc analogs (metrans/include/AvToolkit/AvDec.h:17-77,
// AudEnc.h:10-186): decode any audio stream to interleaved s16, encode
// s16 to AAC/AC3/MP2 with swresample handling sample-format conversion
// and encoder frame-size chunking.

extern "C" {
#include <libswresample/swresample.h>
#include <libavutil/channel_layout.h>
#include <libavutil/audio_fifo.h>
}

GAV_API int gav_demux_has_audio(void* h) {
    return ((GavDemuxer*)h)->astream >= 0;
}
GAV_API void gav_demux_audio_info(void* h, int* codec_id, int* sample_rate,
                                  int* channels, int* tb_num, int* tb_den) {
    auto* d = (GavDemuxer*)h;
    if (d->astream < 0) { *codec_id = -1; return; }
    AVStream* st = d->fmt->streams[d->astream];
    *codec_id = st->codecpar->codec_id;
    *sample_rate = st->codecpar->sample_rate;
    *channels = st->codecpar->ch_layout.nb_channels;
    *tb_num = st->time_base.num; *tb_den = st->time_base.den;
}
GAV_API int gav_demux_audio_extradata(void* h, unsigned char** data) {
    auto* d = (GavDemuxer*)h;
    if (d->astream < 0) return 0;
    AVCodecParameters* par = d->fmt->streams[d->astream]->codecpar;
    *data = par->extradata;
    return par->extradata_size;
}

struct GavAudioDec {
    AVCodecContext* ctx = nullptr;
    AVFrame* frame = nullptr;
    SwrContext* swr = nullptr;
    int out_rate = 0, out_ch = 0;
};

// decode to interleaved s16 at (sample_rate, channels); pass 0 to keep
// the stream's native rate/layout.
GAV_API void* gav_adec_create(int codec_id, const unsigned char* extradata,
                              int extradata_size, int sample_rate,
                              int channels) {
    const AVCodec* c = avcodec_find_decoder((AVCodecID)codec_id);
    if (!c) { snprintf(g_err, sizeof g_err, "no audio decoder %d", codec_id); return nullptr; }
    auto* a = new GavAudioDec();
    a->ctx = avcodec_alloc_context3(c);
    if (extradata_size > 0) {
        a->ctx->extradata = (uint8_t*)av_mallocz(extradata_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(a->ctx->extradata, extradata, extradata_size);
        a->ctx->extradata_size = extradata_size;
    }
    if (sample_rate) a->ctx->sample_rate = sample_rate;
    // propagate a caller-known channel count so codecs that need it
    // before the first packet (pcm_*) can open; bitstream-described
    // layouts (mp3/aac) overwrite it at the first decoded frame
    if (channels > 0)
        av_channel_layout_default(&a->ctx->ch_layout, channels);
    int r = avcodec_open2(a->ctx, c, nullptr);
    if (r < 0) { set_err("adec open", r); avcodec_free_context(&a->ctx); delete a; return nullptr; }
    a->frame = av_frame_alloc();
    a->out_rate = sample_rate; a->out_ch = channels;
    return a;
}

GAV_API void gav_adec_close(void* h) {
    auto* a = (GavAudioDec*)h;
    if (!a) return;
    av_frame_free(&a->frame);
    if (a->swr) swr_free(&a->swr);
    avcodec_free_context(&a->ctx);
    delete a;
}

GAV_API int gav_adec_send(void* h, const unsigned char* data, int size, long long pts) {
    auto* a = (GavAudioDec*)h;
    int r;
    if (!data) {
        r = avcodec_send_packet(a->ctx, nullptr);
    } else {
        AVPacket* pkt = av_packet_alloc();
        av_new_packet(pkt, size);
        memcpy(pkt->data, data, size);
        pkt->pts = pts;
        r = avcodec_send_packet(a->ctx, pkt);
        av_packet_free(&pkt);
    }
    if (r < 0 && r != AVERROR(EAGAIN) && r != AVERROR_EOF) { set_err("adec send", r); return -1; }
    return 0;
}

GAV_API int gav_adec_rate(void* h) {
    auto* a = (GavAudioDec*)h;
    return a->out_rate ? a->out_rate : a->ctx->sample_rate;
}
GAV_API int gav_adec_channels(void* h) {
    auto* a = (GavAudioDec*)h;
    return a->out_ch ? a->out_ch : a->ctx->ch_layout.nb_channels;
}

// -> samples written per channel (interleaved s16; max_shorts is the
// TOTAL buffer capacity in shorts; *ch_out reports the interleave
// width actually used), 0 = need more, -2 = EOF (after draining the
// resampler tail), -1 = error.
GAV_API int gav_adec_receive(void* h, short* out, int max_shorts,
                             long long* pts, int* ch_out) {
    auto* a = (GavAudioDec*)h;
    int r = avcodec_receive_frame(a->ctx, a->frame);
    if (r == AVERROR_EOF) {
        // drain the resampler's internal delay (lost tail otherwise
        // whenever out_rate != stream rate)
        if (a->swr && a->out_ch) {
            uint8_t* outp[1] = {(uint8_t*)out};
            int n = swr_convert(a->swr, outp, max_shorts / a->out_ch,
                                nullptr, 0);
            if (n > 0) {
                *pts = AV_NOPTS_VALUE;
                if (ch_out) *ch_out = a->out_ch;
                return n;
            }
        }
        return -2;
    }
    if (r == AVERROR(EAGAIN)) return 0;
    if (r < 0) { set_err("adec recv", r); return -1; }
    AVFrame* f = a->frame;
    int och = a->out_ch ? a->out_ch : f->ch_layout.nb_channels;
    if (och <= 0) och = 1;
    int orate = a->out_rate ? a->out_rate : f->sample_rate;
    if (!a->swr) {
        AVChannelLayout ol;
        av_channel_layout_default(&ol, och);
        swr_alloc_set_opts2(&a->swr, &ol, AV_SAMPLE_FMT_S16, orate,
                            &f->ch_layout, (AVSampleFormat)f->format,
                            f->sample_rate, 0, nullptr);
        swr_init(a->swr);
        a->out_ch = och;       // freeze: swr converts to this interleave
        a->out_rate = orate;
    }
    uint8_t* outp[1] = {(uint8_t*)out};
    int n = swr_convert(a->swr, outp, max_shorts / a->out_ch,
                        (const uint8_t**)f->extended_data, f->nb_samples);
    *pts = f->pts;
    if (ch_out) *ch_out = a->out_ch;
    av_frame_unref(f);
    if (n < 0) { set_err("swr_convert", n); return -1; }
    return n;
}

struct GavAudioEnc {
    AVCodecContext* ctx = nullptr;
    SwrContext* swr = nullptr;
    AVAudioFifo* fifo = nullptr;
    AVFrame* frame = nullptr;
    AVPacket* pkt = nullptr;
    uint8_t** conv = nullptr;      // cached conversion buffer
    int conv_cap = 0;              // capacity in samples
    long long next_pts = 0;
    int in_rate = 0, in_ch = 0;
    // drained packets waiting for gav_aenc_receive (send pumps the codec
    // so its internal queue never blocks a long sample burst)
    struct QPkt { std::vector<uint8_t> data; long long pts, dts; };
    std::vector<QPkt> q;
    size_t qhead = 0;
};

static int aenc_drain(GavAudioEnc* e) {
    for (;;) {
        int r = avcodec_receive_packet(e->ctx, e->pkt);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
        if (r < 0) { set_err("aenc receive", r); return -1; }
        GavAudioEnc::QPkt qp;
        qp.data.assign(e->pkt->data, e->pkt->data + e->pkt->size);
        qp.pts = e->pkt->pts; qp.dts = e->pkt->dts;
        e->q.push_back(std::move(qp));
        av_packet_unref(e->pkt);
    }
}

GAV_API void gav_aenc_close(void* h);

GAV_API void* gav_aenc_create(const char* name, int sample_rate, int channels,
                              long long bitrate) {
    const AVCodec* c = avcodec_find_encoder_by_name(name);
    if (!c) { snprintf(g_err, sizeof g_err, "no audio encoder %s", name); return nullptr; }
    auto* e = new GavAudioEnc();
    e->ctx = avcodec_alloc_context3(c);
    e->ctx->sample_rate = sample_rate;
    av_channel_layout_default(&e->ctx->ch_layout, channels);
    e->ctx->sample_fmt = c->sample_fmts ? c->sample_fmts[0] : AV_SAMPLE_FMT_S16;
    e->ctx->bit_rate = bitrate > 0 ? bitrate : 128000;
    e->ctx->time_base = {1, sample_rate};
    e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    int r = avcodec_open2(e->ctx, c, nullptr);
    if (r < 0) { set_err("aenc open", r); avcodec_free_context(&e->ctx); delete e; return nullptr; }
    AVChannelLayout il;
    av_channel_layout_default(&il, channels);
    swr_alloc_set_opts2(&e->swr, &e->ctx->ch_layout, e->ctx->sample_fmt,
                        sample_rate, &il, AV_SAMPLE_FMT_S16, sample_rate,
                        0, nullptr);
    e->fifo = av_audio_fifo_alloc(e->ctx->sample_fmt, channels, 1);
    e->frame = av_frame_alloc();
    e->pkt = av_packet_alloc();
    if (!e->swr || swr_init(e->swr) < 0 || !e->fifo || !e->frame || !e->pkt) {
        snprintf(g_err, sizeof g_err, "audio encoder setup failed "
                 "(swr/fifo/frame alloc)");
        gav_aenc_close(e);
        return nullptr;
    }
    // the frame buffer is allocated ONCE at full frame_size capacity;
    // per-chunk encode shrinks nb_samples into it (no per-chunk allocs)
    e->frame->nb_samples = e->ctx->frame_size ? e->ctx->frame_size : 1024;
    e->frame->format = e->ctx->sample_fmt;
    av_channel_layout_copy(&e->frame->ch_layout, &e->ctx->ch_layout);
    e->frame->sample_rate = sample_rate;
    if (av_frame_get_buffer(e->frame, 0) < 0) {
        snprintf(g_err, sizeof g_err, "audio frame alloc failed");
        gav_aenc_close(e);
        return nullptr;
    }
    e->in_rate = sample_rate; e->in_ch = channels;
    return e;
}

GAV_API void gav_aenc_close(void* h) {
    auto* e = (GavAudioEnc*)h;
    if (!e) return;
    av_frame_free(&e->frame);
    av_packet_free(&e->pkt);
    if (e->fifo) av_audio_fifo_free(e->fifo);
    if (e->swr) swr_free(&e->swr);
    if (e->conv) { av_freep(&e->conv[0]); av_freep(&e->conv); }
    avcodec_free_context(&e->ctx);
    delete e;
}

GAV_API int gav_aenc_frame_size(void* h) {
    auto* e = (GavAudioEnc*)h;
    return e->ctx->frame_size ? e->ctx->frame_size : 1024;
}
GAV_API int gav_aenc_extradata(void* h, unsigned char** data) {
    auto* e = (GavAudioEnc*)h;
    *data = e->ctx->extradata;
    return e->ctx->extradata_size;
}
GAV_API int gav_aenc_codec_id(void* h) {
    return (int)((GavAudioEnc*)h)->ctx->codec_id;
}

// feed interleaved s16; NULL = flush.  Use gav_aenc_receive to drain.
GAV_API int gav_aenc_send(void* h, const short* samples, int nsamples) {
    auto* e = (GavAudioEnc*)h;
    int full_fs = e->frame->nb_samples;   // capacity allocated at create
    if (samples && nsamples > 0) {
        // convert to encoder fmt into the cached buffer, push into fifo
        if (nsamples > e->conv_cap) {
            if (e->conv) { av_freep(&e->conv[0]); av_freep(&e->conv); }
            int lines;
            if (av_samples_alloc_array_and_samples(
                    &e->conv, &lines, e->ctx->ch_layout.nb_channels,
                    nsamples, e->ctx->sample_fmt, 0) < 0) {
                e->conv = nullptr; e->conv_cap = 0;
                snprintf(g_err, sizeof g_err, "aenc conv alloc failed");
                return -1;
            }
            e->conv_cap = nsamples;
        }
        const uint8_t* inp[1] = {(const uint8_t*)samples};
        int n = swr_convert(e->swr, e->conv, nsamples, inp, nsamples);
        if (n < 0) { set_err("aenc swr_convert", n); return -1; }
        if (n > 0 && av_audio_fifo_write(e->fifo, (void**)e->conv, n) < n) {
            snprintf(g_err, sizeof g_err, "aenc fifo write failed");
            return -1;
        }
    }
    int fs = gav_aenc_frame_size(h);
    bool flush = (samples == nullptr);
    while (av_audio_fifo_size(e->fifo) >= fs ||
           (flush && av_audio_fifo_size(e->fifo) > 0)) {
        int n = av_audio_fifo_size(e->fifo) < fs ? av_audio_fifo_size(e->fifo) : fs;
        if (av_frame_make_writable(e->frame) < 0) {
            snprintf(g_err, sizeof g_err, "aenc frame not writable");
            return -1;
        }
        e->frame->nb_samples = n;     // shrink into the full-size buffer
        av_audio_fifo_read(e->fifo, (void**)e->frame->data, n);
        e->frame->pts = e->next_pts;
        int r = avcodec_send_frame(e->ctx, e->frame);
        if (r == AVERROR(EAGAIN)) {
            aenc_drain(e);
            r = avcodec_send_frame(e->ctx, e->frame);
        }
        e->frame->nb_samples = full_fs;
        if (r < 0) {
            // EAGAIN even after a drain means the chunk was NOT taken:
            // losing it silently would leave an audible gap
            set_err("aenc send", r);
            return -1;
        }
        e->next_pts += n;
        if (aenc_drain(e) < 0) return -1;
        if (av_audio_fifo_size(e->fifo) == 0) break;
    }
    if (flush) {
        int r = avcodec_send_frame(e->ctx, nullptr);
        if (r < 0 && r != AVERROR_EOF) { set_err("aenc flush", r); return -1; }
        if (aenc_drain(e) < 0) return -1;
    }
    return 0;
}

GAV_API int gav_aenc_receive(void* h, unsigned char** data, long long* pts,
                             long long* dts) {
    auto* e = (GavAudioEnc*)h;
    if (e->qhead < e->q.size()) {
        auto& qp = e->q[e->qhead++];
        *data = qp.data.data(); *pts = qp.pts; *dts = qp.dts;
        if (e->qhead == e->q.size()) { /* lazily clear on next send */ }
        return (int)qp.data.size();
    }
    if (e->qhead && e->qhead == e->q.size()) { e->q.clear(); e->qhead = 0; }
    av_packet_unref(e->pkt);
    int r = avcodec_receive_packet(e->ctx, e->pkt);
    if (r == AVERROR(EAGAIN)) return 0;
    if (r == AVERROR_EOF) return -2;
    if (r < 0) { set_err("aenc recv", r); return -1; }
    *data = e->pkt->data; *pts = e->pkt->pts; *dts = e->pkt->dts;
    return e->pkt->size;
}

// ---- muxer with optional audio stream --------------------------------
// (two-stream variant of gav_mux_open; audio timebase = 1/sample_rate)

// shared mux helpers: audio-stream setup + avio/write_header tail (with
// full cleanup on failure — avio_closep before freeing the context)
static AVStream* mux_add_audio_stream(AVFormatContext* fmt, int acodec_id,
                                      int sample_rate, int channels,
                                      const unsigned char* aextra,
                                      int aextra_size) {
    AVStream* as = avformat_new_stream(fmt, nullptr);
    if (!as) return nullptr;
    as->codecpar->codec_type = AVMEDIA_TYPE_AUDIO;
    as->codecpar->codec_id = (AVCodecID)acodec_id;
    as->codecpar->sample_rate = sample_rate;
    // AAC/AC3/MP2 frame sizes so the mp4 muxer can compute durations
    as->codecpar->frame_size =
        acodec_id == AV_CODEC_ID_AAC ? 1024 :
        acodec_id == AV_CODEC_ID_AC3 ? 1536 :
        acodec_id == AV_CODEC_ID_MP2 ? 1152 : 0;
    av_channel_layout_default(&as->codecpar->ch_layout, channels);
    if (aextra_size > 0) {
        as->codecpar->extradata = (uint8_t*)av_mallocz(aextra_size + AV_INPUT_BUFFER_PADDING_SIZE);
        memcpy(as->codecpar->extradata, aextra, aextra_size);
        as->codecpar->extradata_size = aextra_size;
    }
    as->time_base = {1, sample_rate};
    return as;
}

static void* mux_finish_open(GavMuxer* m, const char* path) {
    int r;
    if (!(m->fmt->oformat->flags & AVFMT_NOFILE)) {
        r = avio_open(&m->fmt->pb, path, AVIO_FLAG_WRITE);
        if (r < 0) { set_err("avio_open", r); avformat_free_context(m->fmt); delete m; return nullptr; }
    }
    r = avformat_write_header(m->fmt, nullptr);
    if (r < 0) {
        set_err("write_header", r);
        if (!(m->fmt->oformat->flags & AVFMT_NOFILE) && m->fmt->pb)
            avio_closep(&m->fmt->pb);
        avformat_free_context(m->fmt);
        delete m;
        return nullptr;
    }
    m->header_written = true;
    return m;
}

GAV_API void* gav_mux_open_av(const char* path, int w, int h, int fps_num,
                              int fps_den, int vcodec,
                              const unsigned char* vextra, int vextra_size,
                              int acodec_id, int sample_rate, int channels,
                              const unsigned char* aextra, int aextra_size) {
    if (acodec_id <= 0) {
        // same enum-or-negated-raw-id mapping as the A/V branch below —
        // gav_mux_open's 0/1/2 ternary would turn raw ids into MJPEG
        AVCodecID id = vcodec == 0 ? AV_CODEC_ID_H264 :
                       vcodec == 1 ? AV_CODEC_ID_HEVC :
                       vcodec == 2 ? AV_CODEC_ID_MJPEG :
                       (AVCodecID)(-vcodec);
        return mux_open_avid(path, w, h, fps_num, fps_den, id,
                             vextra, vextra_size);
    }
    {
        auto* m = new GavMuxer();
        int r = avformat_alloc_output_context2(&m->fmt, nullptr, nullptr, path);
        if (r < 0) { set_err("alloc_output", r); delete m; return nullptr; }
        AVStream* vs = avformat_new_stream(m->fmt, nullptr);
        if (!vs) {
            snprintf(g_err, sizeof g_err, "avformat_new_stream failed");
            avformat_free_context(m->fmt); delete m; return nullptr;
        }
        vs->codecpar->codec_type = AVMEDIA_TYPE_VIDEO;
        // 0/1/2 = the legacy enum; negative = -(raw AVCodecID), so raw
        // ids 1/2 (mpeg1/mpeg2) cannot collide with the enum values
        vs->codecpar->codec_id = vcodec == 0 ? AV_CODEC_ID_H264 :
                                 vcodec == 1 ? AV_CODEC_ID_HEVC :
                                 vcodec == 2 ? AV_CODEC_ID_MJPEG :
                                 (AVCodecID)(-vcodec);
        vs->codecpar->width = w; vs->codecpar->height = h;
        if (vextra_size > 0) {
            vs->codecpar->extradata = (uint8_t*)av_mallocz(vextra_size + AV_INPUT_BUFFER_PADDING_SIZE);
            memcpy(vs->codecpar->extradata, vextra, vextra_size);
            vs->codecpar->extradata_size = vextra_size;
        }
        vs->time_base = {fps_den, fps_num};
        vs->avg_frame_rate = {fps_num, fps_den};
        m->vstream = vs->index;
        m->enc_tb = {fps_den, fps_num};
        if (!mux_add_audio_stream(m->fmt, acodec_id, sample_rate, channels,
                                  aextra, aextra_size)) {
            snprintf(g_err, sizeof g_err, "avformat_new_stream failed");
            avformat_free_context(m->fmt); delete m; return nullptr;
        }
        return mux_finish_open(m, path);
    }
}

// audio-only muxer (the reference Muxer accepts a NULL video side and
// writes bare audio containers, Muxer.h:51-90 / AppMux DemuxAV -> .aac)
GAV_API void* gav_mux_open_audio(const char* path, int acodec_id,
                                 int sample_rate, int channels,
                                 const unsigned char* aextra,
                                 int aextra_size) {
    auto* m = new GavMuxer();
    int r = avformat_alloc_output_context2(&m->fmt, nullptr, nullptr, path);
    if (r < 0 || !m->fmt) { set_err("alloc_output", r); delete m; return nullptr; }
    if (!mux_add_audio_stream(m->fmt, acodec_id, sample_rate, channels,
                              aextra, aextra_size)) {
        snprintf(g_err, sizeof g_err, "avformat_new_stream failed");
        avformat_free_context(m->fmt); delete m; return nullptr;
    }
    m->vstream = -1;
    return mux_finish_open(m, path);
}

// stream: 0 = video (pts in 1/fps), 1 = audio (pts in 1/sample_rate)
GAV_API int gav_mux_write_stream(void* h, int stream, const unsigned char* data,
                                 int size, long long pts, long long dts, int key) {
    auto* m = (GavMuxer*)h;
    if (stream == 0) {
        if (m->vstream < 0) { snprintf(g_err, sizeof g_err, "audio-only muxer has no video stream"); return -1; }
        return gav_mux_write(h, data, size, pts, dts, key);
    }
    AVPacket* pkt = av_packet_alloc();
    av_new_packet(pkt, size);
    memcpy(pkt->data, data, size);
    // the audio stream is the last one (index 1 in A/V muxers, 0 in
    // audio-only muxers); a video-only muxer has none
    AVStream* st = m->fmt->streams[m->fmt->nb_streams - 1];
    if (st->codecpar->codec_type != AVMEDIA_TYPE_AUDIO) {
        av_packet_free(&pkt);
        snprintf(g_err, sizeof g_err, "muxer has no audio stream");
        return -1;
    }
    AVRational atb = {1, st->codecpar->sample_rate};
    // AV_NOPTS_VALUE must propagate unscaled, like the video lane above
    // (TS audio PES without per-packet PTS hands out the sentinel)
    pkt->pts = pts == AV_NOPTS_VALUE ? AV_NOPTS_VALUE
                                     : av_rescale_q(pts, atb, st->time_base);
    pkt->dts = dts == AV_NOPTS_VALUE ? AV_NOPTS_VALUE
                                     : av_rescale_q(dts, atb, st->time_base);
    pkt->stream_index = st->index;
    // honor the caller's sync flag: not every audio codec's packets are
    // seek points (TrueHD major sync etc.)
    if (key) pkt->flags |= AV_PKT_FLAG_KEY;
    int r = av_interleaved_write_frame(m->fmt, pkt);
    av_packet_free(&pkt);
    if (r < 0) { set_err("mux audio", r); return -1; }
    return 0;
}

// ============================================================ 10-bit lane
// P010/10-bit support (the reference's P016 paths: AppNvTrans 8<->10-bit,
// NvDecLite 10-bit output).  Samples cross the ABI as lsb-aligned u16
// ("yuv420p10" in gmat_tpu/core/formats.py).

GAV_API int gav_dec_receive16(void* h, unsigned short* y, unsigned short* u,
                              unsigned short* v, int w, int hgt,
                              long long* pts) {
    auto* d = (GavDecoder*)h;
    int r = dec_acquire(d);
    if (r != 1) return r;
    d->pending = 0;
    AVFrame* f = d->frame;
    *pts = f->pts != AV_NOPTS_VALUE ? f->pts : f->best_effort_timestamp;
    d->last_interlaced = f->interlaced_frame ? 1 : 0;
    d->last_tff = f->top_field_first ? 1 : 0;
    AVPixelFormat pf = (AVPixelFormat)f->format;
    const uint8_t* src[4] = {f->data[0], f->data[1], f->data[2], f->data[3]};
    int src_w = f->width, src_h = f->height;
    if (dec_apply_crop(d, f, src, &src_w, &src_h) < 0) {
        av_frame_unref(f);
        return -1;
    }
    if (pf == AV_PIX_FMT_YUV420P10LE && src_w == w && src_h == hgt) {
        // I420 ceil chroma convention (odd dims): ceil(w/2) u16 samples
        // per row at the caller's ceil stride
        int cs = (w + 1) / 2, ch = (hgt + 1) / 2;
        for (int i = 0; i < hgt; i++)
            memcpy(y + (size_t)i * w, src[0] + (size_t)i * f->linesize[0], w * 2);
        for (int i = 0; i < ch; i++) {
            memcpy(u + (size_t)i * cs, src[1] + (size_t)i * f->linesize[1], cs * 2);
            memcpy(v + (size_t)i * cs, src[2] + (size_t)i * f->linesize[2], cs * 2);
        }
    } else {
        if (!dec_get_sws(d, src_w, src_h, pf, w, hgt,
                         AV_PIX_FMT_YUV420P10LE)) {
            snprintf(g_err, sizeof g_err, "no conversion from pixel "
                     "format %d", (int)pf);
            av_frame_unref(f);
            return -1;
        }
        uint8_t* dst[4] = {(uint8_t*)y, (uint8_t*)u, (uint8_t*)v, nullptr};
        int cs2 = ((w + 1) / 2) * 2;   // ceil chroma width in bytes
        int dstride[4] = {w * 2, cs2, cs2, 0};
        sws_scale(d->sws, src, f->linesize, 0, src_h, dst, dstride);
    }
    av_frame_unref(f);
    return 1;
}

// 10-bit still/video encoder (libx265 main10); input lsb-aligned u16.
GAV_API void* gav_enc_create10(const char* name, int w, int h, int fps_num,
                               int fps_den, long long bitrate, int gop,
                               int bf, const char* preset, double crf,
                               int still_image, const char* opts) {
    const AVCodec* c = avcodec_find_encoder_by_name(name);
    if (!c) { snprintf(g_err, sizeof g_err, "no encoder %s", name); return nullptr; }
    auto* e = new GavEncoder();
    e->ctx = avcodec_alloc_context3(c);
    e->ctx->width = w; e->ctx->height = h;
    e->ctx->time_base = {fps_den, fps_num};
    e->ctx->framerate = {fps_num, fps_den};
    e->ctx->pix_fmt = AV_PIX_FMT_YUV420P10LE;
    e->ctx->gop_size = still_image ? 1 : (gop > 0 ? gop : 300);
    e->ctx->max_b_frames = still_image ? 0 : bf;
    if (bitrate > 0) e->ctx->bit_rate = bitrate;
    e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    e->ctx->thread_count = 1;
    if (preset && *preset) av_opt_set(e->ctx->priv_data, "preset", preset, 0);
    if (crf >= 0) av_opt_set_double(e->ctx->priv_data, "crf", crf, 0);
    AVDictionary* dict = nullptr;
    if (opts && *opts) av_dict_parse_string(&dict, opts, "=", ",", 0);
    int r = avcodec_open2(e->ctx, c, opts && *opts ? &dict : nullptr);
    av_dict_free(&dict);
    if (r < 0) { set_err("open enc10", r); avcodec_free_context(&e->ctx); delete e; return nullptr; }
    e->frame = av_frame_alloc();
    e->frame->format = e->ctx->pix_fmt;
    e->frame->width = w; e->frame->height = h;
    av_frame_get_buffer(e->frame, 0);
    e->pkt = av_packet_alloc();
    return e;
}

GAV_API int gav_enc_send16(void* h, const unsigned short* y,
                           const unsigned short* u, const unsigned short* v,
                           long long pts, int force_key) {
    auto* e = (GavEncoder*)h;
    int r;
    if (!y) {
        r = avcodec_send_frame(e->ctx, nullptr);
    } else {
        av_frame_make_writable(e->frame);
        enc_attach_roi(e);     // ROI applies to the 10-bit lane too
        int w = e->ctx->width, hh = e->ctx->height;
        for (int i = 0; i < hh; i++)
            memcpy(e->frame->data[0] + (size_t)i * e->frame->linesize[0],
                   y + (size_t)i * w, w * 2);
        for (int i = 0; i < hh / 2; i++) {
            memcpy(e->frame->data[1] + (size_t)i * e->frame->linesize[1],
                   u + (size_t)i * (w / 2), w);
            memcpy(e->frame->data[2] + (size_t)i * e->frame->linesize[2],
                   v + (size_t)i * (w / 2), w);
        }
        e->frame->pts = pts >= 0 ? pts : e->in_count;
        e->frame->pict_type = force_key ? AV_PICTURE_TYPE_I : AV_PICTURE_TYPE_NONE;
        r = avcodec_send_frame(e->ctx, e->frame);
        if (r == 0) e->in_count++;   // count only accepted frames
    }
    if (r < 0 && r != AVERROR(EAGAIN) && r != AVERROR_EOF) { set_err("send16", r); return -1; }
    return r == AVERROR(EAGAIN) ? 1 : 0;
}
