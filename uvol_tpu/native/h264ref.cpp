// Reference H.264 decoder shim over the system libavcodec — the
// conformance oracle for uvol_tpu/codecs/h264.py. The reference project
// consumes its V1 texture MP4 through the platform's H.264 decoder
// (/root/reference/src/V1/player.ts:120-132 <video>); this shim plays the
// same role offline: streams our encoder writes must decode in a real,
// independent decoder to the same reconstruction our own decoder
// produces. Used by tests (tests/test_h264.py) — the production decode
// path stays our own (codecs/h264.py), with this as cross-validation.
//
// Build: g++ -shared -fPIC h264ref.cpp -lavcodec -lavutil

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavutil/frame.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
}

#include <cstring>

namespace {

// copy one decoded frame (YUV420P/YUVJ420P) into out; returns bytes or -1
long emit_frame(const AVFrame *f, uint8_t *out, long cap) {
    if (f->format != AV_PIX_FMT_YUV420P && f->format != AV_PIX_FMT_YUVJ420P)
        return -1;
    const int w = f->width, h = f->height;
    const long need = (long)w * h + 2L * (w / 2) * (h / 2);
    if (cap < need) return -2;
    uint8_t *dst = out;
    for (int y = 0; y < h; ++y, dst += w)
        std::memcpy(dst, f->data[0] + (long)y * f->linesize[0], w);
    for (int p = 1; p <= 2; ++p)
        for (int y = 0; y < h / 2; ++y, dst += w / 2)
            std::memcpy(dst, f->data[p] + (long)y * f->linesize[p], w / 2);
    return need;
}

}  // namespace

// Encode frames with the system libx264 (all-intra, CAVLC, deblocking
// off) — generates FOREIGN conformant streams our own decoder must read
// (the inverse direction of uvt_h264ref_decode's oracle role).
extern "C" long uvt_h264ref_encode_x264(const uint8_t *yuv /* F frames of
                                        concatenated YUV420p */,
                                        int w, int h, int nframes, int qp,
                                        uint8_t *out, long out_cap) {
    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) return -10;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    long written = 0;
    int err = 0;
    char params[256];
    if (!ctx || !pkt || !frame) { err = -11; goto done; }
    ctx->width = w;
    ctx->height = h;
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->time_base = (AVRational){1, 30};
    ctx->gop_size = 1;  // all-intra
    ctx->max_b_frames = 0;
    ctx->thread_count = 1;
    snprintf(params, sizeof(params),
             "qp=%d:no-deblock=1:cabac=0:ref=1:subme=0:me=dia:"
             "no-8x8dct=1:aq-mode=0:no-mbtree=1:threads=1", qp);
    av_opt_set(ctx->priv_data, "x264-params", params, 0);
    av_opt_set(ctx->priv_data, "profile", "baseline", 0);
    if (avcodec_open2(ctx, codec, NULL) < 0) { err = -12; goto done; }
    {
        const long ysz = (long)w * h, csz = (long)(w / 2) * (h / 2);
        for (int f = 0; f <= nframes; ++f) {
            AVFrame *src = NULL;
            if (f < nframes) {
                frame->format = AV_PIX_FMT_YUV420P;
                frame->width = w;
                frame->height = h;
                av_frame_make_writable(frame);
                if (!frame->data[0] && av_frame_get_buffer(frame, 0) < 0) {
                    err = -13;
                    goto done;
                }
                const uint8_t *base = yuv + (ysz + 2 * csz) * f;
                for (int y = 0; y < h; ++y)
                    std::memcpy(frame->data[0] + (long)y * frame->linesize[0],
                                base + (long)y * w, w);
                for (int p = 1; p <= 2; ++p) {
                    const uint8_t *cp = base + ysz + (p - 1) * csz;
                    for (int y = 0; y < h / 2; ++y)
                        std::memcpy(
                            frame->data[p] + (long)y * frame->linesize[p],
                            cp + (long)y * (w / 2), w / 2);
                }
                frame->pts = f;
                src = frame;
            }
            int rc = avcodec_send_frame(ctx, src);
            if (rc < 0) { err = -14; goto done; }
            while (true) {
                rc = avcodec_receive_packet(ctx, pkt);
                if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
                if (rc < 0) { err = -15; goto done; }
                if (written + pkt->size > out_cap) { err = -2; goto done; }
                std::memcpy(out + written, pkt->data, pkt->size);
                written += pkt->size;
                av_packet_unref(pkt);
            }
        }
    }
done:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    return err ? err : written;
}

// Caller-specified x264 settings (round-5 rate calibration): `params`
// is an x264-params option string, `profile` an x264 profile name. The
// calibration harness (examples/h264_calibrate.py) uses this to record
// what the in-image x264 actually costs on the V1 texture track at
// matched constraints — the number VERDICT r4 item 1 asked for.
extern "C" long uvt_h264ref_encode_x264_custom(
    const uint8_t *yuv, int w, int h, int nframes, int gop,
    const char *params, const char *profile, uint8_t *out, long out_cap) {
    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) return -10;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    long written = 0;
    int err = 0;
    if (!ctx || !pkt || !frame) { err = -11; goto done; }
    ctx->width = w;
    ctx->height = h;
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->time_base = (AVRational){1, 30};
    ctx->gop_size = gop;
    ctx->max_b_frames = 0;
    ctx->thread_count = 1;
    av_opt_set(ctx->priv_data, "x264-params", params, 0);
    if (profile && profile[0])
        av_opt_set(ctx->priv_data, "profile", profile, 0);
    if (avcodec_open2(ctx, codec, NULL) < 0) { err = -12; goto done; }
    {
        const long ysz = (long)w * h, csz = (long)(w / 2) * (h / 2);
        for (int f = 0; f <= nframes; ++f) {
            AVFrame *src = NULL;
            if (f < nframes) {
                frame->format = AV_PIX_FMT_YUV420P;
                frame->width = w;
                frame->height = h;
                av_frame_make_writable(frame);
                if (!frame->data[0] && av_frame_get_buffer(frame, 0) < 0) {
                    err = -13;
                    goto done;
                }
                const uint8_t *base = yuv + (ysz + 2 * csz) * f;
                for (int y = 0; y < h; ++y)
                    std::memcpy(frame->data[0] + (long)y * frame->linesize[0],
                                base + (long)y * w, w);
                for (int p = 1; p <= 2; ++p) {
                    const uint8_t *cp = base + ysz + (p - 1) * csz;
                    for (int y = 0; y < h / 2; ++y)
                        std::memcpy(
                            frame->data[p] + (long)y * frame->linesize[p],
                            cp + (long)y * (w / 2), w / 2);
                }
                frame->pts = f;
                src = frame;
            }
            int rc = avcodec_send_frame(ctx, src);
            if (rc < 0) { err = -14; goto done; }
            while (true) {
                rc = avcodec_receive_packet(ctx, pkt);
                if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
                if (rc < 0) { err = -15; goto done; }
                if (written + pkt->size > out_cap) { err = -2; goto done; }
                std::memcpy(out + written, pkt->data, pkt->size);
                written += pkt->size;
                av_packet_unref(pkt);
            }
        }
    }
done:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    return err ? err : written;
}

// Inter-coded foreign streams (round-4 motion conformance): gop-size P
// chains, 16x16 partitions only, selectable subpel refinement (subme 0
// = full-pel MVs, 2 = quarter-pel — exercises the decoder's 6-tap /
// bilinear interpolation paths), CAVLC, deblocking off.
extern "C" long uvt_h264ref_encode_x264_gop(const uint8_t *yuv, int w, int h,
                                            int nframes, int qp, int gop,
                                            int subme, uint8_t *out,
                                            long out_cap) {
    const AVCodec *codec = avcodec_find_encoder_by_name("libx264");
    if (!codec) return -10;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    long written = 0;
    int err = 0;
    char params[320];
    if (!ctx || !pkt || !frame) { err = -11; goto done; }
    ctx->width = w;
    ctx->height = h;
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->time_base = (AVRational){1, 30};
    ctx->gop_size = gop;
    ctx->max_b_frames = 0;
    ctx->thread_count = 1;
    snprintf(params, sizeof(params),
             "qp=%d:no-deblock=1:cabac=0:ref=1:subme=%d:me=dia:"
             "no-8x8dct=1:aq-mode=0:no-mbtree=1:threads=1:"
             "partitions=none:weightp=0:keyint=%d:min-keyint=%d:"
             "no-scenecut=1",
             qp, subme, gop, gop);
    av_opt_set(ctx->priv_data, "x264-params", params, 0);
    av_opt_set(ctx->priv_data, "profile", "baseline", 0);
    if (avcodec_open2(ctx, codec, NULL) < 0) { err = -12; goto done; }
    {
        const long ysz = (long)w * h, csz = (long)(w / 2) * (h / 2);
        for (int f = 0; f <= nframes; ++f) {
            AVFrame *src = NULL;
            if (f < nframes) {
                frame->format = AV_PIX_FMT_YUV420P;
                frame->width = w;
                frame->height = h;
                av_frame_make_writable(frame);
                if (!frame->data[0] && av_frame_get_buffer(frame, 0) < 0) {
                    err = -13;
                    goto done;
                }
                const uint8_t *base = yuv + (ysz + 2 * csz) * f;
                for (int y = 0; y < h; ++y)
                    std::memcpy(frame->data[0] + (long)y * frame->linesize[0],
                                base + (long)y * w, w);
                for (int p = 1; p <= 2; ++p) {
                    const uint8_t *cp = base + ysz + (p - 1) * csz;
                    for (int y = 0; y < h / 2; ++y)
                        std::memcpy(
                            frame->data[p] + (long)y * frame->linesize[p],
                            cp + (long)y * (w / 2), w / 2);
                }
                frame->pts = f;
                src = frame;
            }
            int rc = avcodec_send_frame(ctx, src);
            if (rc < 0) { err = -14; goto done; }
            while (true) {
                rc = avcodec_receive_packet(ctx, pkt);
                if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
                if (rc < 0) { err = -15; goto done; }
                if (written + pkt->size > out_cap) { err = -2; goto done; }
                std::memcpy(out + written, pkt->data, pkt->size);
                written += pkt->size;
                av_packet_unref(pkt);
            }
        }
    }
done:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    return err ? err : written;
}

extern "C" long uvt_h264ref_decode(const uint8_t *data, long size,
                                   uint8_t *out, long out_cap,
                                   int *dims /* [w, h, nframes] */) {
    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_H264);
    if (!codec) return -10;
    AVCodecParserContext *parser = av_parser_init(codec->id);
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    AVPacket *pkt = av_packet_alloc();
    AVFrame *frame = av_frame_alloc();
    long written = 0;
    int nframes = 0, w = 0, h = 0, err = 0;
    if (!parser || !ctx || !pkt || !frame || avcodec_open2(ctx, codec, NULL) < 0) {
        err = -11;
        goto done;
    }
    {
        const uint8_t *p = data;
        long remaining = size;
        bool flushed = false;
        while (!flushed) {
            if (remaining > 0) {
                int used = av_parser_parse2(parser, ctx, &pkt->data, &pkt->size,
                                            p, (int)remaining, AV_NOPTS_VALUE,
                                            AV_NOPTS_VALUE, 0);
                if (used < 0) { err = -12; goto done; }
                p += used;
                remaining -= used;
            } else {
                pkt->data = NULL;  // triggers parser flush, then decoder flush
                pkt->size = 0;
                av_parser_parse2(parser, ctx, &pkt->data, &pkt->size, NULL, 0,
                                 AV_NOPTS_VALUE, AV_NOPTS_VALUE, 0);
                flushed = true;
            }
            if (pkt->size || flushed) {
                // on the flush pass, first deliver the parser's final
                // packet (if any), THEN the decoder-flush NULL packet —
                // otherwise frames buffered for reordering are dropped
                if (flushed && pkt->size) {
                    int rc0 = avcodec_send_packet(ctx, pkt);
                    if (rc0 < 0 && rc0 != AVERROR_EOF) { err = -13; goto done; }
                    while (true) {
                        rc0 = avcodec_receive_frame(ctx, frame);
                        if (rc0 == AVERROR(EAGAIN) || rc0 == AVERROR_EOF) break;
                        if (rc0 < 0) { err = -14; goto done; }
                        w = frame->width;
                        h = frame->height;
                        long n0 = emit_frame(frame, out + written, out_cap - written);
                        if (n0 < 0) { err = (int)n0; goto done; }
                        written += n0;
                        ++nframes;
                    }
                    pkt->size = 0;
                    pkt->data = NULL;
                }
                int rc = avcodec_send_packet(ctx, pkt->size ? pkt : NULL);
                if (rc < 0 && rc != AVERROR_EOF) { err = -13; goto done; }
                while (true) {
                    rc = avcodec_receive_frame(ctx, frame);
                    if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) break;
                    if (rc < 0) { err = -14; goto done; }
                    w = frame->width;
                    h = frame->height;
                    long n = emit_frame(frame, out + written, out_cap - written);
                    if (n < 0) { err = (int)n; goto done; }
                    written += n;
                    ++nframes;
                }
            }
        }
    }
done:
    av_frame_free(&frame);
    av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    if (parser) av_parser_close(parser);
    if (err) return err;
    dims[0] = w;
    dims[1] = h;
    dims[2] = nframes;
    return written;
}
