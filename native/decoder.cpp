// Native video decode tier: sampled-frame extraction via FFmpeg.
//
// The ingest hot loop (SURVEY.md §3.2 HOT LOOP 1) decodes every frame of
// every video; doing it through Python/OpenCV allocates a Python object
// per decoded frame and runs the sample/convert logic under the
// interpreter. This library keeps the whole loop native:
//
//   open → decode → keep every interval-th frame → swscale to the CLIP
//   geometry (shortest-edge resize + center crop, bicubic) → write RGB24
//   directly into a caller-provided contiguous uint8 buffer.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment). The
// sampling-interval *policy* stays in Python (ingest/frames.py) where it
// is unit-tested against the reference formulas; this library only
// executes the plan.
//
// Build: `make` in this directory (links libavformat/avcodec/avutil/
// swscale). Python side: video_quierer_tpu/ingest/native.py.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstring>
#include <string>

namespace {

struct Opened {
    AVFormatContext* fmt = nullptr;
    AVCodecContext* codec = nullptr;
    int stream_index = -1;

    ~Opened() {
        if (codec) avcodec_free_context(&codec);
        if (fmt) avformat_close_input(&fmt);
    }

    bool open(const char* path) {
        if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0)
            return false;
        if (avformat_find_stream_info(fmt, nullptr) < 0) return false;
        const AVCodec* dec = nullptr;
        stream_index = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                           &dec, 0);
        if (stream_index < 0 || !dec) return false;
        codec = avcodec_alloc_context3(dec);
        if (!codec) return false;
        if (avcodec_parameters_to_context(
                codec, fmt->streams[stream_index]->codecpar) < 0)
            return false;
        // Bounded threading: frame-threaded decoders add startup latency
        // that dominates short clips; 4 threads is the knee for 1080p.
        codec->thread_count = 4;
        return avcodec_open2(codec, dec, nullptr) >= 0;
    }

    double fps() const {
        AVRational r = fmt->streams[stream_index]->avg_frame_rate;
        if (r.num <= 0 || r.den <= 0)
            r = fmt->streams[stream_index]->r_frame_rate;
        return (r.num > 0 && r.den > 0) ? av_q2d(r) : 0.0;
    }

    long total_frames() const {
        AVStream* st = fmt->streams[stream_index];
        if (st->nb_frames > 0) return st->nb_frames;
        // container doesn't store the count — estimate from duration
        double f = fps();
        if (f > 0 && fmt->duration > 0)
            return (long)(f * (double)fmt->duration / AV_TIME_BASE);
        return 0;
    }
};

}  // namespace

extern "C" {

struct VqtVideoInfo {
    double fps;
    long total_frames;
    int width;
    int height;
};

// Probe stream metadata. Returns 0 on success.
int vqt_probe(const char* path, VqtVideoInfo* out) {
    Opened v;
    if (!v.open(path)) return -1;
    out->fps = v.fps();
    out->total_frames = v.total_frames();
    out->width = v.codec->width;
    out->height = v.codec->height;
    return 0;
}

// Decode and sample frames.
//   interval     keep frames where frame_number % interval == 0
//   max_frames   stop after this many kept frames
//   target       output side length (square, CLIP geometry)
//   out_frames   [max_frames, target, target, 3] uint8 RGB, caller-owned
//   out_ts       [max_frames] double timestamps (frame_number / fps,
//                fps<=0 → 30, matching video_search_overhaul.py:190)
// Returns number of frames written, or <0 on error.
int vqt_decode_sampled(const char* path, int interval, int max_frames,
                       int target, unsigned char* out_frames,
                       double* out_ts) {
    if (interval < 1 || max_frames < 1 || target < 8) return -2;
    Opened v;
    if (!v.open(path)) return -1;
    const double fps = v.fps();
    const double ts_denom = fps > 0 ? fps : 30.0;

    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    SwsContext* sws = nullptr;
    int sws_w = -1, sws_h = -1;
    // scaled buffer (shortest edge == target); cropped into out_frames
    uint8_t* scaled = nullptr;
    int scaled_cap = 0;

    long frame_number = 0;
    int kept = 0;
    const size_t frame_bytes = (size_t)target * target * 3;

    auto process_frame = [&](AVFrame* f) {
        if (kept >= max_frames) return;
        if (frame_number % interval == 0) {
            const int w = f->width, h = f->height;
            // Shortest-edge scale GEOMETRY matches ops/preprocess.py;
            // the resample kernel does not exactly — SWS_BICUBIC's
            // coefficients differ slightly from cv2.INTER_CUBIC, so
            // native-tier pixels (and embeddings) carry a small,
            // tolerance-tested divergence from the Python path
            // (tests/test_native_decoder.py pins the bound).
            int nw, nh;
            if (h < w) {
                nh = target;
                nw = std::max(target, (int)lround((double)w * target / h));
            } else {
                nw = target;
                nh = std::max(target, (int)lround((double)h * target / w));
            }
            // ONE fused swscale pass: YUV→RGB conversion and the bicubic
            // downscale together, reading the source frame once and
            // writing only the [nh, nw] result. The previous two-stage
            // full-res convert + cv::resize read/wrote full-res RGB
            // twice: 365 → 416 f/s per core at 720p (decode itself now
            // dominates), and the OpenCV link dependency is gone.
            if (!sws || sws_w != w || sws_h != h) {
                if (sws) sws_freeContext(sws);
                sws = sws_getContext(w, h, (AVPixelFormat)f->format,
                                     nw, nh, AV_PIX_FMT_RGB24,
                                     SWS_BICUBIC, nullptr, nullptr,
                                     nullptr);
                sws_w = w;
                sws_h = h;
                int need = nw * nh * 3;
                if (need > scaled_cap) {
                    av_free(scaled);
                    scaled = (uint8_t*)av_malloc(need);
                    scaled_cap = need;
                }
            }
            if (sws && scaled) {
                uint8_t* dst[4] = {scaled, nullptr, nullptr, nullptr};
                int dst_stride[4] = {nw * 3, 0, 0, 0};
                sws_scale(sws, f->data, f->linesize, 0, h, dst, dst_stride);
                // center crop: contiguous row copies into the caller's
                // frame slot
                const int top = (nh - target) / 2;
                const int left = (nw - target) / 2;
                uint8_t* out = out_frames + (size_t)kept * frame_bytes;
                for (int r = 0; r < target; ++r)
                    std::memcpy(out + (size_t)r * target * 3,
                                scaled + ((size_t)(top + r) * nw + left) * 3,
                                (size_t)target * 3);
                out_ts[kept] = (double)frame_number / ts_denom;
                ++kept;
            }
        }
        ++frame_number;
    };

    int ret = 0;
    while (kept < max_frames && (ret = av_read_frame(v.fmt, pkt)) >= 0) {
        if (pkt->stream_index == v.stream_index) {
            if (avcodec_send_packet(v.codec, pkt) >= 0) {
                while (avcodec_receive_frame(v.codec, frame) >= 0)
                    process_frame(frame);
            }
        }
        av_packet_unref(pkt);
    }
    // drain the decoder
    if (kept < max_frames) {
        avcodec_send_packet(v.codec, nullptr);
        while (avcodec_receive_frame(v.codec, frame) >= 0)
            process_frame(frame);
    }

    if (sws) sws_freeContext(sws);
    av_free(scaled);
    av_frame_free(&frame);
    av_packet_free(&pkt);
    return kept;
}

}  // extern "C"
