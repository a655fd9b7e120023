/* Baseline harness: times the reference C cprocess kernels
 * (/root/reference/src/cprocess, compiled in place, CPU paths only)
 * on this host, producing the denominators for BASELINE.md.
 *
 * Workloads mirror BASELINE.md configs / bench.py's 10-layer timeline:
 *   transfer_1080p       rec709->linear on one 1080p f16 frame
 *   cross_1080p          video_mix_cross_f32, two full 1080p frames
 *   overchain10_kernel   bg copy + 9x video_mix_over_f32 (layers pre-filled)
 *   engine10             per-frame fills + attenuate + 2 scales + cross +
 *                        over chain (what the C engine does per bench.py frame)
 *   scale_480p_1080p     video_scale_bilinear_f32 480x270 -> ~4x
 *   dv_reconstruct       video_reconstruct_dv 720x480 4:1:1 -> linear f16
 *
 * Prints one JSON object with fps per workload.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include "framework.h"

static double now_s(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + ts.tv_nsec * 1e-9;
}

static rgba_frame_f32 alloc_f32(int x0, int y0, int x1, int y1) {
    rgba_frame_f32 f;
    box2i_set(&f.full_window, x0, y0, x1, y1);
    f.current_window = f.full_window;
    size_t n = (size_t)(x1 - x0 + 1) * (y1 - y0 + 1);
    f.data = calloc(n, sizeof(rgba_f32));
    return f;
}

static rgba_frame_f16 alloc_f16(int x0, int y0, int x1, int y1) {
    rgba_frame_f16 f;
    box2i_set(&f.full_window, x0, y0, x1, y1);
    f.current_window = f.full_window;
    size_t n = (size_t)(x1 - x0 + 1) * (y1 - y0 + 1);
    f.data = calloc(n, sizeof(rgba_f16));
    return f;
}

/* Solid fill into the frame's current_window (what SolidColorVideoSource
 * does per pull). */
static void fill_solid(rgba_frame_f32 *f, float r, float g, float b, float a) {
    for (int y = f->current_window.min.y; y <= f->current_window.max.y; y++) {
        rgba_f32 *row = video_get_pixel_f32(f, f->current_window.min.x, y);
        int w = f->current_window.max.x - f->current_window.min.x + 1;
        for (int x = 0; x < w; x++) {
            row[x].r = r; row[x].g = g; row[x].b = b; row[x].a = a;
        }
    }
}

typedef void (*bench_fn)(void *);

static double run_bench(bench_fn fn, void *arg, double min_time) {
    fn(arg); fn(arg);  /* warmup */
    int iters = 0;
    double t0 = now_s(), t1;
    do {
        fn(arg);
        iters++;
        t1 = now_s();
    } while (t1 - t0 < min_time);
    return iters / (t1 - t0);
}

/* ---- workload state ---- */
static rgba_frame_f32 out_frame, bg, layers[9], scale_src, cross_a, cross_b;
static rgba_frame_f16 transfer_frame, dv_frame;
static coded_image dv_image;

static void w_transfer(void *arg) {
    (void) arg;
    size_t n = (size_t) 1920 * 1080 * 4;
    video_transfer_rec709_to_linear_scene(&transfer_frame.data->r,
                                          &transfer_frame.data->r, n);
}

static void w_cross(void *arg) {
    (void) arg;
    video_mix_cross_f32(&out_frame, &bg, &layers[0], 0.5f);
}

static void w_overchain(void *arg) {
    (void) arg;
    video_copy_frame_alpha_f32(&out_frame, &bg, 1.0f);
    for (int i = 0; i < 9; i++)
        video_mix_over_f32(&out_frame, &layers[i], 0.7f);
}

static void w_engine10(void *arg) {
    (void) arg;
    /* layers 0-4: animated solid cards (opacity rides the over's mix_b;
     * the reference's CPU path has no standalone attenuate kernel) */
    for (int i = 0; i < 5; i++)
        fill_solid(&layers[i], 0.5f, 0.25f, 0.3f, 0.9f);
    /* layers 5-6: scaled cards (fill small source + bilinear scale) */
    fill_solid(&scale_src, 0.2f, 0.6f, 0.8f, 0.8f);
    for (int i = 5; i < 7; i++) {
        v2f tp = { 200.0f + 100.0f * i, 150.0f };
        v2f sp = { 0.0f, 0.0f };
        v2f fac = { 1.5f, 1.5f };
        layers[i].current_window = layers[i].full_window;
        video_scale_bilinear_f32(&layers[i], tp, &scale_src, sp, fac);
    }
    /* layer 7: crossfade of two cards */
    fill_solid(&cross_a, 1.0f, 0.4f, 0.1f, 0.6f);
    fill_solid(&cross_b, 0.1f, 0.4f, 1.0f, 0.6f);
    video_mix_cross_f32(&layers[7], &cross_a, &cross_b, 0.5f);
    /* layer 8: white strip */
    fill_solid(&layers[8], 1.0f, 1.0f, 1.0f, 0.08f);
    /* background + over chain */
    fill_solid(&bg, 0.1f, 0.1f, 0.12f, 1.0f);
    w_overchain(NULL);
}

static void w_scale(void *arg) {
    (void) arg;
    v2f tp = { 0.0f, 0.0f }, sp = { 0.0f, 0.0f }, fac = { 4.0f, 4.0f };
    out_frame.current_window = out_frame.full_window;
    video_scale_bilinear_f32(&out_frame, tp, &scale_src, sp, fac);
}

static void w_dv(void *arg) {
    (void) arg;
    video_reconstruct_dv(&dv_frame, &dv_image);
}

int main(int argc, char **argv) {
    double min_time = (argc > 1) ? atof(argv[1]) : 1.5;

    init_half();

    out_frame = alloc_f32(0, 0, 1919, 1079);
    bg = alloc_f32(0, 0, 1919, 1079);
    fill_solid(&bg, 0.1f, 0.1f, 0.12f, 1.0f);
    /* windows mirroring bench.py's timeline */
    for (int i = 0; i < 5; i++) {
        layers[i] = alloc_f32(60 * i, 40 * i, 60 * i + 900, 40 * i + 600);
        fill_solid(&layers[i], 0.5f, 0.25f, 0.3f, 0.9f);
    }
    layers[5] = alloc_f32(200, 150, 200 + 719, 150 + 404);
    layers[6] = alloc_f32(500, 150, 500 + 719, 150 + 404);
    layers[7] = alloc_f32(400, 300, 1500, 900);
    layers[8] = alloc_f32(0, 980, 1919, 1079);
    for (int i = 5; i < 9; i++)
        fill_solid(&layers[i], 0.4f, 0.4f, 0.4f, 0.5f);
    scale_src = alloc_f32(0, 0, 479, 269);
    fill_solid(&scale_src, 0.2f, 0.6f, 0.8f, 0.8f);
    cross_a = alloc_f32(400, 300, 1500, 900);
    cross_b = alloc_f32(400, 300, 1500, 900);

    transfer_frame = alloc_f16(0, 0, 1919, 1079);
    for (size_t i = 0; i < (size_t) 1920 * 1080 * 4; i++)
        (&transfer_frame.data->r)[i] = (uint16_t)(i * 2654435761u >> 17) & 0x3FFF;

    dv_frame = alloc_f16(0, -1, 719, 478);
    static uint8_t yplane[480 * 720], cbplane[480 * 180], crplane[480 * 180];
    for (size_t i = 0; i < sizeof(yplane); i++) yplane[i] = 16 + (i % 220);
    for (size_t i = 0; i < sizeof(cbplane); i++) {
        cbplane[i] = 16 + (i % 224);
        crplane[i] = 240 - (i % 224);
    }
    dv_image.data[0] = yplane; dv_image.stride[0] = 720; dv_image.line_count[0] = 480;
    dv_image.data[1] = cbplane; dv_image.stride[1] = 180; dv_image.line_count[1] = 480;
    dv_image.data[2] = crplane; dv_image.stride[2] = 180; dv_image.line_count[2] = 480;
    dv_image.data[3] = NULL; dv_image.stride[3] = 0; dv_image.line_count[3] = 0;
    dv_image.free_func = NULL;

    double transfer = run_bench(w_transfer, NULL, min_time);
    double cross = run_bench(w_cross, NULL, min_time);
    double overchain = run_bench(w_overchain, NULL, min_time);
    double engine10 = run_bench(w_engine10, NULL, min_time);
    double scale = run_bench(w_scale, NULL, min_time);
    double dv = run_bench(w_dv, NULL, min_time);

    printf("{\"transfer_1080p_fps\": %.2f, \"cross_1080p_fps\": %.2f, "
           "\"overchain10_kernel_fps\": %.2f, \"engine10_fps\": %.2f, "
           "\"scale_480p_1080p_fps\": %.2f, \"dv_reconstruct_fps\": %.2f}\n",
           transfer, cross, overchain, engine10, scale, dv);
    return 0;
}
