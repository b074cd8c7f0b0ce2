/* C per-pixel baseline renderer — the reference-architecture stand-in.
 *
 * MathMap's fast path compiles each filter to C with gcc at runtime and
 * renders with a per-pixel function over row-slice worker threads
 * (cgen.c + new_template.c + mathmap_common.c [unverified — reference
 * mount empty, SURVEY.md §0]). This file is what that pipeline would emit
 * for the three BASELINE config-2 distortion filters (fisheye, twirl,
 * pond): identical coordinate convention, polar math, bilinear sampling
 * and transparent-color edge behavior as mathmap_tpu's semantics, compiled
 * -O3 -march=native and parallelized over row slices with pthreads.
 *
 * Purpose: ground bench.py's `vs_baseline` ratio in a measured C number
 * (VERDICT r1 item 3) instead of the NumPy-oracle stand-in.
 */

#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const float *in;  /* (H, W, 4) RGBA in [0,1] */
    float *out;       /* (H, W, 4) */
    int w, h;
    int filter_id;    /* 0 fisheye, 1 twirl, 2 pond */
    float p0, p1, p2; /* filter params */
    int row0, row1;   /* this slice's rows [row0, row1) */
} slice_t;

/* bilinear sample with 'color' (transparent) edge behavior */
static inline void sample_bilinear(const float *img, int w, int h,
                                   float px, float py, float *rgba) {
    float x0f = floorf(px), y0f = floorf(py);
    float fx = px - x0f, fy = py - y0f;
    int x0 = (int)x0f, y0 = (int)y0f;
    float acc[4] = {0, 0, 0, 0};
    for (int dy = 0; dy < 2; dy++) {
        int yy = y0 + dy;
        float wy = dy ? fy : 1.0f - fy;
        if (yy < 0 || yy >= h || wy == 0.0f) continue; /* edge color = 0 */
        for (int dx = 0; dx < 2; dx++) {
            int xx = x0 + dx;
            float wx = dx ? fx : 1.0f - fx;
            if (xx < 0 || xx >= w || wx == 0.0f) continue;
            const float *p = img + ((size_t)yy * w + xx) * 4;
            float wgt = wx * wy;
            acc[0] += wgt * p[0];
            acc[1] += wgt * p[1];
            acc[2] += wgt * p[2];
            acc[3] += wgt * p[3];
        }
    }
    rgba[0] = acc[0]; rgba[1] = acc[1]; rgba[2] = acc[2]; rgba[3] = acc[3];
}

static void *render_slice(void *arg) {
    slice_t *s = (slice_t *)arg;
    const int w = s->w, h = s->h;
    const float cw = w * 0.5f, ch = h * 0.5f;
    const float R = sqrtf(cw * cw + ch * ch);
    const float TWO_PI = 6.28318530717958647692f;
    for (int j = s->row0; j < s->row1; j++) {
        float y = ch - 0.5f - (float)j;
        float *orow = s->out + (size_t)j * w * 4;
        for (int i = 0; i < w; i++) {
            float x = (float)i + 0.5f - cw;
            float r = sqrtf(x * x + y * y);
            float a = fmodf(atan2f(y, x), TWO_PI);
            if (a < 0) a += TWO_PI;
            float r2 = r, a2 = a;
            switch (s->filter_id) {
            case 0: /* fisheye: r' = R * (r/R)^strength */
                r2 = R * powf(r / R, s->p0);
                break;
            case 1: { /* twirl: a' = a + angle * (1 - r/R)^2 */
                float u = 1.0f - r / R;
                a2 = a + s->p0 * u * u;
                break;
            }
            case 2: /* pond: r' = r + amp * sin(r/wl * 2pi + phase) */
                r2 = r + s->p0 * sinf(r / s->p1 * TWO_PI + s->p2);
                break;
            }
            float sx = r2 * cosf(a2);
            float sy = r2 * sinf(a2);
            /* world -> pixel-center coords */
            float px = sx + (cw - 0.5f);
            float py = (ch - 0.5f) - sy;
            sample_bilinear(s->in, w, h, px, py, orow + (size_t)i * 4);
        }
    }
    return NULL;
}

/* Render one frame; returns 0 on success. Spawns `threads` row slices. */
int mm_c_baseline_render(const float *in, float *out, int w, int h,
                         int filter_id, float p0, float p1, float p2,
                         int threads) {
    if (threads < 1) threads = 1;
    if (threads > 64) threads = 64;
    pthread_t tids[64];
    slice_t slices[64];
    int rows = (h + threads - 1) / threads;
    int n = 0;
    for (int t = 0; t < threads; t++) {
        int r0 = t * rows, r1 = r0 + rows;
        if (r0 >= h) break;
        if (r1 > h) r1 = h;
        slices[n] = (slice_t){in, out, w, h, filter_id, p0, p1, p2, r0, r1};
        if (t + 1 < threads && r1 < h) {
            if (pthread_create(&tids[n], NULL, render_slice, &slices[n]) != 0)
                render_slice(&slices[n]);  /* degrade to inline */
            else {
                n++;
                continue;
            }
        } else {
            render_slice(&slices[n]);
        }
    }
    for (int t = 0; t < n; t++) pthread_join(tids[t], NULL);
    return 0;
}
