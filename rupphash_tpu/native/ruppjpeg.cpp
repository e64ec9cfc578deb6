// Fused JPEG -> luma(+box-resample) probe decoder.
//
// The scan's hashing probe needs only (full dims, <=512px luma); the
// PIL route materializes the full RGB image, copies it into numpy
// (tobytes: as expensive as the decode itself at 4 MP on this host),
// then runs two more full-resolution passes (luma601, box_resample).
// This decoder streams libjpeg scanlines straight into the luma +
// area-resample accumulators, so the full-resolution RGB never exists
// in memory and each decoded row is consumed cache-hot.
//
// Bit-exactness contract (tests/test_jpegfast.py): output is
// bit-identical to decode_bytes() -> luma601 -> box_resample_u8 for
// every stream it accepts.  Three layers enforce that:
//   1. pixel source: libjpeg defaults (JDCT_ISLOW + fancy upsampling)
//      match Pillow's JpegDecode.c settings; mismatched library
//      behavior is caught by the runtime self-probe in jpegfast.py.
//   2. luma: same integer math as ruppnative.cpp:luma601.
//   3. resample: same float64 weighted accumulation, in the same
//      FP-addition order, as ruppnative.cpp:box_resample_u8 (identity
//      weights reproduce the no-resample branches exactly: integer-
//      valued doubles round to the same u8).
// Anything uncertain fails closed: non-8-bit precision, colorspaces
// other than grayscale/YCbCr/RGB, or ANY libjpeg warning (Pillow's
// tolerance for dirty streams differs by version, so dirty streams
// take the PIL path and inherit its exact behavior).
//
// Reference parity: the reference decodes JPEG on the host too
// (zune-jpeg full decode, scanner.rs:461-520) before hashing; this is
// the same architectural slot with the copies fused away.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 ruppjpeg.cpp -o ruppjpeg.so
//        -ljpeg   (system libjpeg-turbo; absent => jpegfast disabled)

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf jb;
};

void on_error(j_common_ptr cinfo) {
    ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Silence stderr but keep the default handler's warning accounting:
// num_warnings is the fail-closed truncation/corruption signal.
void on_message(j_common_ptr cinfo, int msg_level) {
    if (msg_level < 0) cinfo->err->num_warnings++;
}

// Identical to ruppnative.cpp axis_weights (same doubles, same order).
void axis_weights(int src, int dst, std::vector<int>& starts,
                  std::vector<std::vector<double>>& weights) {
    const double s = (double)src / (double)dst;
    starts.resize(dst);
    weights.resize(dst);
    for (int i = 0; i < dst; i++) {
        double lo = i * s, hi = (i + 1) * s;
        int k0 = (int)std::floor(lo);
        int k1 = std::min((int)std::ceil(hi), src);
        starts[i] = k0;
        auto& w = weights[i];
        w.resize(k1 - k0);
        for (int k = k0; k < k1; k++)
            w[k - k0] =
                std::min(hi, (double)(k + 1)) - std::max(lo, (double)k);
    }
}

}  // namespace

extern "C" {

// Decode a JPEG stream and emit the hashing-probe luma directly:
// out is (nh, nw) u8 where (nw, nh) are the caller-computed target
// dims (pdq_ref.calculate_target_dimensions, or the full dims when no
// downsample applies).  fw/fh receive the decoded full dims (caller
// cross-checks them against its own header parse).  Returns 0 on
// success; any nonzero => caller falls back to the PIL path.
int jpeg_luma_probe(const uint8_t* data, int64_t len, int nw, int nh,
                    uint8_t* out, int* fw, int* fh) {
    if (len < 4 || nw <= 0 || nh <= 0) return -1;
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = on_error;
    jerr.pub.emit_message = on_message;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        return -4;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
                 (unsigned long)len);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    // Fail closed on anything Pillow would decode through a different
    // pixel path: 12-bit precision, CMYK/YCCK (Pillow keeps CMYK mode
    // then converts), or exotic component counts.
    if (cinfo.data_precision != 8 ||
        !(cinfo.jpeg_color_space == JCS_GRAYSCALE ||
          cinfo.jpeg_color_space == JCS_YCbCr ||
          cinfo.jpeg_color_space == JCS_RGB)) {
        jpeg_destroy_decompress(&cinfo);
        return -2;
    }
    const bool gray = (cinfo.jpeg_color_space == JCS_GRAYSCALE);
    cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
    // defaults match Pillow: dct_method JDCT_ISLOW, fancy upsampling
    jpeg_start_decompress(&cinfo);
    const int w = (int)cinfo.output_width;
    const int h = (int)cinfo.output_height;
    const int ch = cinfo.output_components;
    *fw = w;
    *fh = h;
    if (w <= 0 || h <= 0 || nw > w || nh > h ||
        (gray ? ch != 1 : ch != 3)) {
        jpeg_destroy_decompress(&cinfo);
        return -3;
    }

    if (nw == w && nh == h) {
        // identity: prepare_luma_fast never resamples <=512px images,
        // so the output is the luma rows themselves — skip the
        // double-precision accumulators entirely
        std::vector<uint8_t> row((size_t)w * ch);
        JSAMPROW rp = row.data();
        while (cinfo.output_scanline < cinfo.output_height) {
            uint8_t* orow = out + (size_t)cinfo.output_scanline * w;
            if (jpeg_read_scanlines(&cinfo, &rp, 1) != 1) {
                jpeg_destroy_decompress(&cinfo);
                return -6;
            }
            if (gray) {
                std::memcpy(orow, row.data(), (size_t)w);
            } else {
                for (int j = 0; j < w; j++) {
                    const uint8_t* p = row.data() + (size_t)j * 3;
                    uint32_t l = (299u * p[0] + 587u * p[1] +
                                  114u * p[2] + 500u) / 1000u;
                    orow[j] = (uint8_t)l;
                }
            }
        }
        jpeg_finish_decompress(&cinfo);
        const long warn = cinfo.err->num_warnings;
        jpeg_destroy_decompress(&cinfo);
        return warn != 0 ? -5 : 0;
    }

    std::vector<int> rstarts, cstarts;
    std::vector<std::vector<double>> rwts, cwts;
    axis_weights(h, nh, rstarts, rwts);
    axis_weights(w, nw, cstarts, cwts);
    std::vector<double> rwsum(nh), cwsum(nw);
    for (int i = 0; i < nh; i++) {
        double s = 0;
        for (double x : rwts[i]) s += x;
        rwsum[i] = s;
    }
    for (int j = 0; j < nw; j++) {
        double s = 0;
        for (double x : cwts[j]) s += x;
        cwsum[j] = s;
    }

    std::vector<uint8_t> row((size_t)w * ch);
    std::vector<uint8_t> luma(w);
    // Rows-pass accumulators: only the output rows whose source window
    // is still open need storage, but nh*w doubles (<=512 rows) is
    // small; completed rows are immediately column-reduced + rounded.
    std::vector<double> acc((size_t)nh * w, 0.0);
    int next_emit = 0;  // first output row not yet finalized
    JSAMPROW rp = row.data();

    while (cinfo.output_scanline < cinfo.output_height) {
        const int r = (int)cinfo.output_scanline;
        if (jpeg_read_scanlines(&cinfo, &rp, 1) != 1) {
            jpeg_destroy_decompress(&cinfo);
            return -6;
        }
        const uint8_t* lp;
        if (gray) {
            lp = row.data();
        } else {
            // same integer math as ruppnative.cpp:luma601
            for (int j = 0; j < w; j++) {
                const uint8_t* p = row.data() + (size_t)j * 3;
                uint32_t l =
                    (299u * p[0] + 587u * p[1] + 114u * p[2] + 500u) /
                    1000u;
                luma[j] = (uint8_t)l;
            }
            lp = luma.data();
        }
        // scatter this source row into every open output row; windows
        // are ascending, so per-output-row addition order matches the
        // ascending-k order of box_resample_u8's rows pass
        for (int i = next_emit; i < nh; i++) {
            const int k0 = rstarts[i];
            if (r < k0) break;
            const int kn = (int)rwts[i].size();
            if (r >= k0 + kn) continue;  // only possible for i==next_emit
            const double wk = rwts[i][r - k0];
            double* arow = &acc[(size_t)i * w];
            for (int j = 0; j < w; j++) arow[j] += wk * (double)lp[j];
        }
        // finalize output rows whose window just closed
        while (next_emit < nh &&
               r + 1 >= rstarts[next_emit] +
                            (int)rwts[next_emit].size()) {
            double* arow = &acc[(size_t)next_emit * w];
            const double inv = rwsum[next_emit];
            for (int j = 0; j < w; j++) arow[j] /= inv;
            uint8_t* orow = out + (size_t)next_emit * nw;
            for (int j = 0; j < nw; j++) {
                const auto& wv = cwts[j];
                const double* p = arow + cstarts[j];
                double v = 0;
                for (size_t k = 0; k < wv.size(); k++)
                    v += p[k] * wv[k];
                v /= cwsum[j];
                double rv = std::floor(v + 0.5);
                orow[j] =
                    (uint8_t)std::max(0.0, std::min(255.0, rv));
            }
            next_emit++;
        }
    }
    jpeg_finish_decompress(&cinfo);
    // Pillow's per-version tolerance for dirty streams differs; any
    // warning (truncation, extraneous bytes, bad markers) fails closed
    // so the PIL path decides.
    const long warnings = cinfo.err->num_warnings;
    jpeg_destroy_decompress(&cinfo);
    if (warnings != 0) return -5;
    if (next_emit != nh) return -7;
    return 0;
}

}  // extern "C"
