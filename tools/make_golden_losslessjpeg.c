/* Golden lossless-JPEG (ITU T.81 process 14, SOF3) fixture generator.
 *
 * Encodes deterministic 16-bit grayscale test images with GDCM's
 * IJG-derived lossless codec (libgdcmjpeg16, the encoder used across
 * DICOM tooling) — an implementation entirely independent of this
 * repo's encoder/decoder pair, so the committed streams validate the
 * decoder against a second T.81 implementation (VERDICT round 2,
 * "independent RAW-decode validation").
 *
 * Build: gcc -O2 -o make_golden tools/make_golden_losslessjpeg.c \
 *          -I/usr/include/gdcm-3.0/gdcmjpeg/16 -lgdcmjpeg16
 * Run:   ./make_golden <outdir>   (writes golden_p{P}_{W}x{H}.jpg/.raw)
 *
 * The .raw sidecar holds the big-endian uint16 pixels the stream was
 * encoded from.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <jpeglib.h>

/* xorshift PRNG: deterministic across platforms */
static unsigned int rng_state = 42u;
static unsigned int xorshift(void) {
    unsigned int x = rng_state;
    x ^= x << 13; x ^= x >> 17; x ^= x << 5;
    rng_state = x;
    return x;
}

static void make_image(JSAMPLE *buf, int w, int h, int maxval) {
    /* gradient + blocky structure + noise: exercises small and large
     * prediction residuals and 0xFF byte-stuffing */
    int x, y;
    for (y = 0; y < h; y++) {
        for (x = 0; x < w; x++) {
            long v = (long)(x * 7 + y * 13)
                + ((x / 8 + y / 8) % 2 ? 4000 : 0)
                + (long)(xorshift() % 97);
            if ((x == 17 && y > 4) || v > maxval) v = maxval; /* hit max */
            buf[y * w + x] = (JSAMPLE)v;
        }
    }
}

static int encode(const char *dir, int predictor, int w, int h) {
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    char path[512];
    FILE *fp;
    JSAMPLE *img = malloc(sizeof(JSAMPLE) * w * h);
    JSAMPROW row;
    int y;

    rng_state = 42u + predictor;  /* per-fixture deterministic pixels */
    make_image(img, w, h, 65535);

    snprintf(path, sizeof path, "%s/golden_p%d_%dx%d.jpg", dir,
             predictor, w, h);
    fp = fopen(path, "wb");
    if (!fp) { perror(path); return 1; }

    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, fp);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 1;
    cinfo.in_color_space = JCS_GRAYSCALE;
    jpeg_set_defaults(&cinfo);
    cinfo.data_precision = 16;
    jpeg_simple_lossless(&cinfo, predictor, 0 /* point transform */);
    jpeg_start_compress(&cinfo, TRUE);
    for (y = 0; y < h; y++) {
        row = img + (size_t)y * w;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(fp);

    /* raw big-endian uint16 sidecar */
    snprintf(path, sizeof path, "%s/golden_p%d_%dx%d.raw", dir,
             predictor, w, h);
    fp = fopen(path, "wb");
    if (!fp) { perror(path); return 1; }
    for (y = 0; y < w * h; y++) {
        unsigned char be[2];
        be[0] = (img[y] >> 8) & 0xFF;
        be[1] = img[y] & 0xFF;
        fwrite(be, 1, 2, fp);
    }
    fclose(fp);
    free(img);
    printf("wrote golden_p%d_%dx%d\n", predictor, w, h);
    return 0;
}

int main(int argc, char **argv) {
    const char *dir = argc > 1 ? argv[1] : ".";
    int p;
    for (p = 1; p <= 7; p++)
        if (encode(dir, p, 61, 23)) return 1;   /* odd sizes on purpose */
    if (encode(dir, 1, 128, 64)) return 1;
    return 0;
}
