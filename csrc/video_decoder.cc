// Native batched video decoder (FFmpeg), the Decord-equivalent host path.
//
// The reference's hot decode path is Decord's C++ VideoReader
// (mmaction/datasets/pipelines/loading.py:1499-1621: DecordInit builds a
// reader + frame index once, DecordDecode fetches an arbitrary batch of
// frame indices). This is the same design on top of the system FFmpeg:
//
//   vd_open(path, target_short_side, threads, &frames, &h, &w) -> handle
//       opens the container, builds a display-order pts index by a
//       demux-only packet scan (no decode - milliseconds), and computes
//       output dims: short side scaled down to >= target_short_side
//       (aspect preserved, even dims for swscale) or native when <= 0.
//   vd_read(handle, indices, n, out)
//       decodes the requested display-order frame indices into out
//       (n * h * w * 3, RGB24). Sorted-unique traversal, keyframe seeks
//       only on backward/far-forward jumps, sequential decode otherwise -
//       the right access pattern for TSN-style near-sorted sampling.
//   vd_close(handle)
//
// Deliberately NOT a torch/CUDA bridge: frames land in a caller-owned
// numpy buffer that feeds the TPU via the fused uint8 device preprocess
// (ops/preprocess.py), so host work is decode + one memcpy.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 video_decoder.cc \
//        -lavformat -lavcodec -lavutil -lswscale
// (loaded via ctypes - clover_tpu/data/video_native.py)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

thread_local std::string g_last_error;

void set_error(const std::string& msg) { g_last_error = msg; }

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  // display-order pts of every frame (sorted ascending)
  std::vector<int64_t> pts_index;
  int out_w = 0, out_h = 0;
  // display-order index of the next frame the decoder will emit, or -1
  // when the position is unknown (after open/seek before any decode)
  int64_t next_emit = -1;

  ~Decoder() {
    if (sws) sws_freeContext(sws);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }
};

bool open_codec(Decoder* d, int threads) {
  AVStream* st = d->fmt->streams[d->stream_index];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) {
    set_error("no decoder for codec id " +
              std::to_string(st->codecpar->codec_id));
    return false;
  }
  d->codec = avcodec_alloc_context3(dec);
  if (!d->codec ||
      avcodec_parameters_to_context(d->codec, st->codecpar) < 0) {
    set_error("codec context setup failed");
    return false;
  }
  // threads=1 by default: the Python loader already runs one decoder per
  // worker; intra-frame threading would oversubscribe the host.
  d->codec->thread_count = threads > 0 ? threads : 1;
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    set_error("avcodec_open2 failed");
    return false;
  }
  return true;
}

// Demux-only scan: collect the pts of every packet of the video stream.
// One packet = one frame for every codec FFmpeg demuxes frame-wise; with
// B-frames the packet (dts) order differs from display order, so sort by
// pts to get the display-order index (what callers address frames by).
bool build_index(Decoder* d) {
  d->pts_index.clear();
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index == d->stream_index) {
      int64_t pts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
      d->pts_index.push_back(pts);
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  std::sort(d->pts_index.begin(), d->pts_index.end());
  if (d->pts_index.empty()) {
    set_error("no video packets in container");
    return false;
  }
  // rewind for the first read
  if (av_seek_frame(d->fmt, d->stream_index, d->pts_index.front(),
                    AVSEEK_FLAG_BACKWARD) < 0) {
    set_error("initial rewind failed");
    return false;
  }
  avcodec_flush_buffers(d->codec);
  d->next_emit = -1;
  return true;
}

// display-order index of a decoded frame by pts (frames arrive from the
// codec in display order)
int64_t display_index(const Decoder* d, int64_t pts) {
  auto it = std::lower_bound(d->pts_index.begin(), d->pts_index.end(), pts);
  if (it == d->pts_index.end() || *it != pts) return -1;
  return it - d->pts_index.begin();
}

// Decode forward until the display-order frame `target` is emitted.
// Returns 1 on success (frame in d->frame), 0 on failure.
int decode_until(Decoder* d, int64_t target) {
  bool draining = false;
  while (true) {
    int ret = avcodec_receive_frame(d->codec, d->frame);
    if (ret == 0) {
      int64_t pts = d->frame->best_effort_timestamp;
      int64_t idx = pts != AV_NOPTS_VALUE ? display_index(d, pts)
                                          : d->next_emit;
      if (idx < 0) idx = d->next_emit >= 0 ? d->next_emit : 0;
      d->next_emit = idx + 1;
      if (idx >= target) return 1;  // >= tolerates missing/odd pts
      av_frame_unref(d->frame);
      continue;
    }
    if (ret == AVERROR_EOF) {
      set_error("EOF before frame " + std::to_string(target));
      return 0;
    }
    if (ret != AVERROR(EAGAIN)) {
      set_error("decode error " + std::to_string(ret));
      return 0;
    }
    if (draining) {
      set_error("drain stalled before frame " + std::to_string(target));
      return 0;
    }
    // feed the next packet of the video stream
    while (true) {
      int rret = av_read_frame(d->fmt, d->pkt);
      if (rret < 0) {  // EOF: enter drain mode
        avcodec_send_packet(d->codec, nullptr);
        draining = true;
        break;
      }
      if (d->pkt->stream_index != d->stream_index) {
        av_packet_unref(d->pkt);
        continue;
      }
      int sret = avcodec_send_packet(d->codec, d->pkt);
      av_packet_unref(d->pkt);
      if (sret < 0 && sret != AVERROR(EAGAIN)) {
        set_error("send_packet error " + std::to_string(sret));
        return 0;
      }
      break;
    }
  }
}

bool seek_to(Decoder* d, int64_t target) {
  int64_t pts = d->pts_index[target];
  if (av_seek_frame(d->fmt, d->stream_index, pts, AVSEEK_FLAG_BACKWARD) < 0) {
    set_error("seek failed");
    return false;
  }
  avcodec_flush_buffers(d->codec);
  d->next_emit = -1;  // unknown until the first decoded pts tells us
  return true;
}

}  // namespace

extern "C" {

const char* vd_last_error() { return g_last_error.c_str(); }

void* vd_open(const char* path, int target_short_side, int threads,
              int* out_frames, int* out_h, int* out_w) {
  // loader workers decode thousands of clips; keep FFmpeg quiet below
  // error level (e.g. swscaler's yuvj-deprecation notice on MJPEG)
  av_log_set_level(AV_LOG_ERROR);
  auto* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    set_error("no stream info");
    delete d;
    return nullptr;
  }
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (d->stream_index < 0) {
    set_error("no video stream");
    delete d;
    return nullptr;
  }
  if (!open_codec(d, threads) || !build_index(d)) {
    delete d;
    return nullptr;
  }
  d->frame = av_frame_alloc();
  d->pkt = av_packet_alloc();

  int w = d->codec->width, h = d->codec->height;
  if (w <= 0 || h <= 0) {
    set_error("codec reports zero dims");
    delete d;
    return nullptr;
  }
  // reduced-resolution decode output: scale so the SHORT side lands at
  // target_short_side (never upsample); even dims keep swscale happy
  if (target_short_side > 0 && std::min(w, h) > target_short_side) {
    double scale = double(target_short_side) / std::min(w, h);
    d->out_w = std::max(2, int(w * scale + 0.5) / 2 * 2);
    d->out_h = std::max(2, int(h * scale + 0.5) / 2 * 2);
  } else {
    d->out_w = w;
    d->out_h = h;
  }
  *out_frames = int(d->pts_index.size());
  *out_h = d->out_h;
  *out_w = d->out_w;
  return d;
}

// Decode display-order `indices[0..n)` into out (n * out_h * out_w * 3,
// RGB24, C-contiguous, caller-allocated). Indices may repeat and arrive
// unsorted; traversal is sorted-unique with seeks only on backward or
// long-forward jumps. Returns 1 ok, 0 error (vd_last_error()).
int vd_read(void* handle, const int32_t* indices, int n, uint8_t* out) {
  auto* d = static_cast<Decoder*>(handle);
  const int64_t nframes = d->pts_index.size();
  const size_t frame_bytes = size_t(d->out_h) * d->out_w * 3;

  std::vector<int32_t> order(n);
  for (int i = 0; i < n; i++) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int a, int b) {
    return indices[a] < indices[b];
  });

  // a forward jump longer than this decodes through rather than seeks
  // (a seek lands on the previous keyframe and re-decodes the GOP anyway)
  const int64_t kSeekAhead = 64;

  int32_t prev_target = -1;
  int prev_out = -1;
  for (int oi = 0; oi < n; oi++) {
    const int out_slot = order[oi];
    int64_t target = indices[out_slot];
    if (target < 0 || target >= nframes) {
      set_error("frame index " + std::to_string(target) + " out of range 0.." +
                std::to_string(nframes - 1));
      return 0;
    }
    if (target == prev_target) {  // duplicate: copy the previous output
      std::memcpy(out + out_slot * frame_bytes, out + prev_out * frame_bytes,
                  frame_bytes);
      continue;
    }
    const bool unknown = d->next_emit < 0;
    if (unknown || target < d->next_emit ||
        target > d->next_emit + kSeekAhead) {
      if (!seek_to(d, target)) return 0;
    }
    if (!decode_until(d, target)) return 0;

    if (!d->sws) {
      d->sws = sws_getContext(d->codec->width, d->codec->height,
                              AVPixelFormat(d->frame->format), d->out_w,
                              d->out_h, AV_PIX_FMT_RGB24,
                              d->out_w < d->codec->width ? SWS_AREA
                                                         : SWS_BILINEAR,
                              nullptr, nullptr, nullptr);
      if (!d->sws) {
        set_error("sws_getContext failed");
        return 0;
      }
    }
    uint8_t* dst[4] = {out + out_slot * frame_bytes, nullptr, nullptr,
                       nullptr};
    int dst_stride[4] = {d->out_w * 3, 0, 0, 0};
    sws_scale(d->sws, d->frame->data, d->frame->linesize, 0,
              d->codec->height, dst, dst_stride);
    av_frame_unref(d->frame);
    prev_target = int32_t(target);
    prev_out = out_slot;
  }
  return 1;
}

void vd_close(void* handle) { delete static_cast<Decoder*>(handle); }

}  // extern "C"
