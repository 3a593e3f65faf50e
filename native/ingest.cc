// Native ingest tool: video files -> training stores, via libav.
//
// The reference normalizes its dataset with ffmpeg/youtube-dl subprocesses
// (process_downloads.py:19,29, utilities.py:69-82) and decodes clips at
// __getitem__ time through torchvision's libav bindings
// (video_utils_custom.py:284-387). This tool is the run-once native
// equivalent (SURVEY.md §7.1 L1): linked directly against
// libavformat/libavcodec/libswscale/libswresample, it decodes a video ONCE
// into (a) an fps-normalized grayscale uint8 .npy frame shard at the target
// size and (b) a mono float32 wav at the target sample rate, printing a JSON
// metadata line. Steady-state training never touches a decoder.
//
//   ingest_native ingest <video> <frames.npy> <audio.wav> <size> <fps> <sr>
//   ingest_native synth  <out.avi> <n_frames> <fps> <size> <sr>   (test video)
//
// `synth` encodes a deterministic moving-square + sine-tone clip (mpeg4 +
// pcm_s16le in AVI) so the decode path is testable without any dataset.
//
// Build: make -C native ingest_native

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

void die(const std::string& msg) {
  fprintf(stderr, "ingest_native: %s\n", msg.c_str());
  exit(1);
}

// ---------------------------------------------------------------------------
// writers
// ---------------------------------------------------------------------------

// .npy v1.0 header for uint8 C-order [n, h, w]; padded to 128 bytes so the
// frame count can be patched in after streaming.
void write_npy_header(FILE* f, int64_t n, int h, int w) {
  char dict[118];
  int len = snprintf(dict, sizeof(dict),
                     "{'descr': '|u1', 'fortran_order': False, "
                     "'shape': (%lld, %d, %d), }",
                     static_cast<long long>(n), h, w);
  std::string hdr(dict, len);
  hdr.resize(117, ' ');
  hdr.push_back('\n');
  fseek(f, 0, SEEK_SET);
  fwrite("\x93NUMPY\x01\x00", 1, 8, f);
  uint16_t hlen = 118;
  fwrite(&hlen, 2, 1, f);
  fwrite(hdr.data(), 1, hdr.size(), f);
}

void write_wav_f32(const char* path, const std::vector<float>& x, int sr) {
  FILE* f = fopen(path, "wb");
  if (!f) die(std::string("cannot open ") + path);
  uint32_t payload = x.size() * 4;
  uint32_t riff = 36 + payload;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff, 4, 1, f);
  fwrite("WAVEfmt ", 1, 8, f);
  uint32_t fmtlen = 16;
  uint16_t fmt = 3, ch = 1, bits = 32;  // IEEE float mono
  uint32_t srate = sr, brate = sr * 4;
  uint16_t block = 4;
  fwrite(&fmtlen, 4, 1, f);
  fwrite(&fmt, 2, 1, f);
  fwrite(&ch, 2, 1, f);
  fwrite(&srate, 4, 1, f);
  fwrite(&brate, 4, 1, f);
  fwrite(&block, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&payload, 4, 1, f);
  fwrite(x.data(), 4, x.size(), f);
  fclose(f);
}

// ---------------------------------------------------------------------------
// ingest (decode)
// ---------------------------------------------------------------------------

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* vctx = nullptr;
  AVCodecContext* actx = nullptr;
  int vstream = -1, astream = -1;

  void open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0)
      die(std::string("cannot open ") + path);
    if (avformat_find_stream_info(fmt, nullptr) < 0) die("no stream info");
    vstream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    astream = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (vstream < 0) die("no video stream");
    vctx = open_codec(vstream);
    if (astream >= 0) actx = open_codec(astream);
  }

  AVCodecContext* open_codec(int idx) {
    const AVCodec* dec =
        avcodec_find_decoder(fmt->streams[idx]->codecpar->codec_id);
    if (!dec) die("decoder not found");
    AVCodecContext* ctx = avcodec_alloc_context3(dec);
    avcodec_parameters_to_context(ctx, fmt->streams[idx]->codecpar);
    if (avcodec_open2(ctx, dec, nullptr) < 0) die("cannot open codec");
    return ctx;
  }
};

int cmd_ingest(int argc, char** argv) {
  if (argc < 7) die("usage: ingest <video> <frames.npy> <audio.wav> <size> <fps> <sr>");
  const char* in = argv[1];
  const char* npy_out = argv[2];
  const char* wav_out = argv[3];
  const int size = atoi(argv[4]);
  const int fps = atoi(argv[5]);
  const int sr = atoi(argv[6]);

  Decoder d;
  d.open(in);

  FILE* npy = fopen(npy_out, "wb");
  if (!npy) die(std::string("cannot open ") + npy_out);
  write_npy_header(npy, 0, size, size);  // patched at the end

  SwsContext* sws = nullptr;
  SwrContext* swr = nullptr;
  std::vector<float> audio;
  std::vector<uint8_t> gray(static_cast<size_t>(size) * size);
  std::vector<uint8_t> prev;
  bool have_prev = false;
  int64_t n_out = 0;
  double tick = 0.0;
  const double dt = 1.0 / fps;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();

  auto scale_frame = [&](AVFrame* fr) {
    sws = sws_getCachedContext(sws, fr->width, fr->height,
                               static_cast<AVPixelFormat>(fr->format),
                               size, size, AV_PIX_FMT_GRAY8,
                               SWS_BILINEAR, nullptr, nullptr, nullptr);
    uint8_t* dst[1] = {gray.data()};
    int dst_stride[1] = {size};
    sws_scale(sws, fr->data, fr->linesize, 0, fr->height, dst, dst_stride);
  };

  auto on_video = [&](AVFrame* fr) {
    double t = fr->pts * av_q2d(d.fmt->streams[d.vstream]->time_base);
    // fps-normalize like ffmpeg's fps filter: each output tick shows the
    // last source frame whose pts <= tick time
    if (have_prev) {
      while (tick + 1e-9 < t) {
        fwrite(prev.data(), 1, prev.size(), npy);
        ++n_out;
        tick += dt;
      }
    }
    scale_frame(fr);
    prev = gray;
    have_prev = true;
  };

  auto on_audio = [&](AVFrame* fr) {
    if (!swr) {
      AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
      swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, sr,
                          &fr->ch_layout,
                          static_cast<AVSampleFormat>(fr->format),
                          fr->sample_rate, 0, nullptr);
      swr_init(swr);
    }
    int max_out = swr_get_out_samples(swr, fr->nb_samples);
    std::vector<float> buf(max_out);
    uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(buf.data())};
    int got = swr_convert(swr, outp, max_out,
                          const_cast<const uint8_t**>(fr->extended_data),
                          fr->nb_samples);
    if (got > 0) audio.insert(audio.end(), buf.begin(), buf.begin() + got);
  };

  auto drain = [&](AVCodecContext* ctx, bool is_video) {
    while (avcodec_receive_frame(ctx, frame) == 0) {
      if (is_video) on_video(frame);
      else on_audio(frame);
      av_frame_unref(frame);
    }
  };

  while (av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.vstream) {
      avcodec_send_packet(d.vctx, pkt);
      drain(d.vctx, true);
    } else if (d.actx && pkt->stream_index == d.astream) {
      avcodec_send_packet(d.actx, pkt);
      drain(d.actx, false);
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(d.vctx, nullptr);
  drain(d.vctx, true);
  if (d.actx) {
    avcodec_send_packet(d.actx, nullptr);
    drain(d.actx, false);
  }
  if (have_prev) {  // final active frame gets its tick
    fwrite(prev.data(), 1, prev.size(), npy);
    ++n_out;
  }
  write_npy_header(npy, n_out, size, size);
  fclose(npy);
  write_wav_f32(wav_out, audio, sr);
  printf("{\"frames\": %lld, \"fps\": %d, \"size\": %d, "
         "\"audio_samples\": %zu, \"samplerate\": %d, \"has_audio\": %s}\n",
         static_cast<long long>(n_out), fps, size, audio.size(), sr,
         d.actx ? "true" : "false");
  return 0;
}

// ---------------------------------------------------------------------------
// synth (encode a deterministic test clip)
// ---------------------------------------------------------------------------

int cmd_synth(int argc, char** argv) {
  if (argc < 6) die("usage: synth <out.avi> <n_frames> <fps> <size> <sr>");
  const char* out = argv[1];
  const int n_frames = atoi(argv[2]);
  const int fps = atoi(argv[3]);
  const int size = atoi(argv[4]);
  const int sr = atoi(argv[5]);

  AVFormatContext* ofmt = nullptr;
  avformat_alloc_output_context2(&ofmt, nullptr, "avi", out);
  if (!ofmt) die("cannot alloc output");

  // video: mpeg4 yuv420p
  const AVCodec* vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  AVStream* vs = avformat_new_stream(ofmt, nullptr);
  AVCodecContext* vc = avcodec_alloc_context3(vcodec);
  vc->width = size;
  vc->height = size;
  vc->pix_fmt = AV_PIX_FMT_YUV420P;
  vc->time_base = {1, fps};
  vc->bit_rate = 800000;
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
    vc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(vc, vcodec, nullptr) < 0) die("cannot open mpeg4");
  avcodec_parameters_from_context(vs->codecpar, vc);
  vs->time_base = vc->time_base;

  // audio: pcm_s16le mono
  const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
  AVStream* as = avformat_new_stream(ofmt, nullptr);
  AVCodecContext* ac = avcodec_alloc_context3(acodec);
  ac->sample_rate = sr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  av_channel_layout_copy(&ac->ch_layout, &mono);
  ac->sample_fmt = AV_SAMPLE_FMT_S16;
  ac->time_base = {1, sr};
  if (avcodec_open2(ac, acodec, nullptr) < 0) die("cannot open pcm");
  avcodec_parameters_from_context(as->codecpar, ac);
  as->time_base = ac->time_base;

  if (avio_open(&ofmt->pb, out, AVIO_FLAG_WRITE) < 0) die("cannot open file");
  if (avformat_write_header(ofmt, nullptr) < 0) die("cannot write header");

  AVPacket* pkt = av_packet_alloc();
  auto mux = [&](AVCodecContext* ctx, AVStream* st) {
    while (avcodec_receive_packet(ctx, pkt) == 0) {
      av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(ofmt, pkt);
      av_packet_unref(pkt);
    }
  };

  // video frames: white square sweeping diagonally on black
  AVFrame* vf = av_frame_alloc();
  vf->format = AV_PIX_FMT_YUV420P;
  vf->width = size;
  vf->height = size;
  av_frame_get_buffer(vf, 0);
  const int sq = size / 8;
  for (int i = 0; i < n_frames; ++i) {
    av_frame_make_writable(vf);
    memset(vf->data[0], 0, static_cast<size_t>(vf->linesize[0]) * size);
    memset(vf->data[1], 128, static_cast<size_t>(vf->linesize[1]) * size / 2);
    memset(vf->data[2], 128, static_cast<size_t>(vf->linesize[2]) * size / 2);
    int pos = (i * (size - sq)) / (n_frames > 1 ? n_frames - 1 : 1);
    for (int y = pos; y < pos + sq; ++y)
      memset(vf->data[0] + static_cast<size_t>(y) * vf->linesize[0] + pos, 255, sq);
    vf->pts = i;
    avcodec_send_frame(vc, vf);
    mux(vc, vs);
  }
  avcodec_send_frame(vc, nullptr);
  mux(vc, vs);

  // audio: 440 Hz sine for the full clip duration
  int total = static_cast<int>(static_cast<int64_t>(n_frames) * sr / fps);
  AVFrame* af = av_frame_alloc();
  af->format = AV_SAMPLE_FMT_S16;
  av_channel_layout_copy(&af->ch_layout, &mono);
  af->sample_rate = sr;
  af->nb_samples = 1024;
  av_frame_get_buffer(af, 0);
  int written = 0;
  while (written < total) {
    av_frame_make_writable(af);
    int n = std::min(1024, total - written);
    af->nb_samples = n;
    int16_t* s = reinterpret_cast<int16_t*>(af->data[0]);
    for (int k = 0; k < n; ++k)
      s[k] = static_cast<int16_t>(
          12000 * sin(2.0 * M_PI * 440.0 * (written + k) / sr));
    af->pts = written;
    avcodec_send_frame(ac, af);
    mux(ac, as);
    written += n;
  }
  avcodec_send_frame(ac, nullptr);
  mux(ac, as);

  av_write_trailer(ofmt);
  avio_closep(&ofmt->pb);
  printf("{\"written\": \"%s\", \"frames\": %d, \"audio_samples\": %d}\n",
         out, n_frames, total);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  av_log_set_level(AV_LOG_ERROR);
  if (argc < 2) die("usage: ingest_native <ingest|synth> ...");
  if (strcmp(argv[1], "ingest") == 0) return cmd_ingest(argc - 1, argv + 1);
  if (strcmp(argv[1], "synth") == 0) return cmd_synth(argc - 1, argv + 1);
  die("unknown subcommand");
  return 1;
}
