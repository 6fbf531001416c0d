// dsvbits — native bit-serial runtime for the dsv1_tpu framework.
//
// The DSV1 bitstream interleaves self-delimiting exp-Golomb codes, so the
// *decode* side of entropy coding is inherently serial per stream. This
// module implements that serial work (HZCC symbol parsing, ZBRLE, motion
// substream decode with the raster MV predictor) plus MSB-first bit packing,
// behind a plain C ABI consumed via ctypes. Everything per-coefficient
// (quant/dequant/scatter) stays on the TPU; only the byte-level walk is here.
//
// Format references (behavioral, not copied): reference bs.c:49-267
// (bit I/O + UEG/SEG/NEG + ZBRLE), hzcc.c:295-435 (decode-side run
// semantics incl. the buffer-overrun guard), dsv.c:189-231 (MV prediction),
// dsv_decoder.c:73-145 (motion/stability substream layout).

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
    const uint8_t* buf;
    uint32_t len;     // hard length in bytes (never read past)
    uint32_t pos = 0; // bit position

    BitReader(const uint8_t* b, uint32_t l) : buf(b), len(l) {}

    inline uint32_t byte_pos() const { return pos >> 3; }

    inline int bit() {
        uint32_t byte = pos >> 3;
        if (byte >= len) { pos++; return 0; }
        int b = (buf[byte] >> (7 - (pos & 7))) & 1;
        pos++;
        return b;
    }

    inline uint32_t bits(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; i++) v = (v << 1) | (uint32_t)bit();
        return v;
    }

    inline void align() { pos = (pos + 7) & ~7u; }

    inline uint32_t ueg() {
        uint32_t v = 1;
        while (!bit()) {
            v = (v << 1) | (uint32_t)bit();
            if (v > (1u << 30)) break; // corrupt-stream backstop
        }
        return v - 1;
    }

    inline int32_t seg() {
        int32_t v = (int32_t)ueg();
        if (v && bit()) return -v;
        return v;
    }

    inline int32_t neg() {
        int32_t v = (int32_t)ueg() + 1;
        if (v && bit()) return -v;
        return v;
    }
};

struct BitWriter {
    uint8_t* buf;
    uint32_t cap;     // capacity in bytes
    uint32_t pos = 0; // bit position

    BitWriter(uint8_t* b, uint32_t c) : buf(b), cap(c) {}

    inline void put_bits(uint64_t v, int n) {
        for (int i = n - 1; i >= 0; i--) {
            uint32_t byte = pos >> 3;
            if (byte >= cap) return;
            if ((v >> i) & 1) buf[byte] |= (uint8_t)(1u << (7 - (pos & 7)));
            pos++;
        }
    }

    inline void align() { pos = (pos + 7) & ~7u; }
};

} // namespace

extern "C" {

// Parse an HZCC coefficient section. `buf` points at the section start
// (a byte-aligned 32-bit big-endian run count), `hardlen` bounds reads,
// `planelen` is the plane byte budget used by the decoder's overrun guard.
// Outputs up to max_syms (run, value) pairs. Returns the number of values
// emitted; *consumed_bits receives the final (aligned) bit position.
int32_t dsv1n_parse_hzcc(const uint8_t* buf, uint32_t hardlen,
                         uint32_t planelen, int32_t max_syms,
                         uint32_t* runs_out, int32_t* vals_out,
                         uint32_t* nruns_out, uint32_t* endpos_bits) {
    BitReader r(buf, hardlen);
    uint32_t nruns = r.bits(32);
    r.align();
    *nruns_out = nruns;
    int32_t lim = (int32_t)nruns;
    if (lim > max_syms) lim = max_syms;
    int32_t n = 0;
    if (lim > 0) {
        // stream: r0, (r1 v0), (r2 v1), ..., v_{last}
        runs_out[0] = r.ueg();
        n = lim;
        for (int32_t i = 1; i < lim; i++) {
            runs_out[i] = r.ueg();
            vals_out[i - 1] = r.neg();
            if (r.byte_pos() >= planelen) { n = i - 1; break; } // guard
        }
        if (n == lim) {
            vals_out[lim - 1] = r.neg();
            if (r.byte_pos() >= planelen) n = lim - 1;
        }
    }
    r.align();
    *endpos_bits = r.pos;
    return n;
}

// Decode `n` ZBRLE flags.
void dsv1n_zbrle_decode(const uint8_t* buf, uint32_t len, int32_t n,
                        uint8_t* out) {
    BitReader r(buf, len);
    uint32_t nz = 0;
    for (int32_t i = 0; i < n; i++) {
        if (nz == 0) nz = r.ueg();
        else nz--;
        out[i] = (nz == 0) ? 1 : 0;
    }
}

// Decode `n` UEG values (used for substream lengths etc.).
void dsv1n_parse_ueg(const uint8_t* buf, uint32_t len, int32_t n,
                     uint32_t* out) {
    BitReader r(buf, len);
    for (int32_t i = 0; i < n; i++) out[i] = r.ueg();
}

static inline int32_t mv_pred_1(int32_t left, int32_t top, int32_t topleft) {
    int32_t dif = left + top - topleft;
    int32_t dl = dif - left; if (dl < 0) dl = -dl;
    int32_t dt = dif - top;  if (dt < 0) dt = -dt;
    return (dl < dt) ? left : top;
}

// Full motion-data decode: ZBRLE block modes, SEG MV residuals with the
// raster-order left/top/topleft predictor, and intra sub-block masks.
void dsv1n_decode_motion(const uint8_t* mode_buf, uint32_t mode_len,
                         const uint8_t* mvx_buf, uint32_t mvx_len,
                         const uint8_t* mvy_buf, uint32_t mvy_len,
                         const uint8_t* sbim_buf, uint32_t sbim_len,
                         int32_t nbh, int32_t nbv,
                         uint8_t* modes, int16_t* mvx, int16_t* mvy,
                         uint8_t* submask) {
    BitReader rm(mode_buf, mode_len);
    BitReader rx(mvx_buf, mvx_len);
    BitReader ry(mvy_buf, mvy_len);
    BitReader rs(sbim_buf, sbim_len);
    uint32_t nz = 0;
    for (int32_t j = 0; j < nbv; j++) {
        for (int32_t i = 0; i < nbh; i++) {
            int32_t idx = i + j * nbh;
            if (nz == 0) nz = rm.ueg(); else nz--;
            int mode = (nz == 0) ? 1 : 0;
            modes[idx] = (uint8_t)mode;
            if (mode == 0) { // inter: predict from decoded neighbours
                int32_t lx = 0, ly = 0, tx = 0, ty = 0, tlx = 0, tly = 0;
                if (i > 0 && modes[idx - 1] == 0) { lx = mvx[idx - 1]; ly = mvy[idx - 1]; }
                if (j > 0 && modes[idx - nbh] == 0) { tx = mvx[idx - nbh]; ty = mvy[idx - nbh]; }
                if (i > 0 && j > 0 && modes[idx - nbh - 1] == 0) {
                    tlx = mvx[idx - nbh - 1]; tly = mvy[idx - nbh - 1];
                }
                mvx[idx] = (int16_t)(rx.seg() + mv_pred_1(lx, tx, tlx));
                mvy[idx] = (int16_t)(ry.seg() + mv_pred_1(ly, ty, tly));
                submask[idx] = 0;
            } else {
                mvx[idx] = 0; mvy[idx] = 0;
                submask[idx] = rs.bit() ? 0xF : (uint8_t)rs.bits(4);
            }
        }
    }
}

// Encode motion data into four substreams (inverse of the above); returns
// byte lengths via *_len. Buffers must be pre-zeroed and large enough.
void dsv1n_encode_motion(const uint8_t* modes, const int16_t* mvx,
                         const int16_t* mvy, const uint8_t* submask,
                         int32_t nbh, int32_t nbv,
                         uint8_t* mode_buf, uint32_t* mode_len,
                         uint8_t* mvx_buf, uint32_t* mvx_len,
                         uint8_t* mvy_buf, uint32_t* mvy_len,
                         uint8_t* sbim_buf, uint32_t* sbim_len,
                         uint32_t bufcap) {
    BitWriter wx(mvx_buf, bufcap), wy(mvy_buf, bufcap), ws(sbim_buf, bufcap);
    BitWriter wm(mode_buf, bufcap);
    uint32_t nz = 0;
    auto put_ueg = [](BitWriter& w, uint32_t v) {
        uint32_t vp = v + 1;
        int k = 0; while ((vp >> (k + 1)) != 0) k++;
        for (int i = k - 1; i >= 0; i--) {
            w.put_bits(0, 1);
            w.put_bits((vp >> i) & 1, 1);
        }
        w.put_bits(1, 1);
    };
    auto put_seg = [&put_ueg](BitWriter& w, int32_t v) {
        uint32_t a = (uint32_t)(v < 0 ? -v : v);
        put_ueg(w, a);
        if (a) w.put_bits(v < 0 ? 1 : 0, 1);
    };
    for (int32_t j = 0; j < nbv; j++) {
        for (int32_t i = 0; i < nbh; i++) {
            int32_t idx = i + j * nbh;
            if (modes[idx]) { put_ueg(wm, nz); nz = 0; } else nz++;
            if (modes[idx] == 0) {
                int32_t lx = 0, ly = 0, tx = 0, ty = 0, tlx = 0, tly = 0;
                if (i > 0 && modes[idx - 1] == 0) { lx = mvx[idx - 1]; ly = mvy[idx - 1]; }
                if (j > 0 && modes[idx - nbh] == 0) { tx = mvx[idx - nbh]; ty = mvy[idx - nbh]; }
                if (i > 0 && j > 0 && modes[idx - nbh - 1] == 0) {
                    tlx = mvx[idx - nbh - 1]; tly = mvy[idx - nbh - 1];
                }
                put_seg(wx, mvx[idx] - mv_pred_1(lx, tx, tlx));
                put_seg(wy, mvy[idx] - mv_pred_1(ly, ty, tly));
            } else {
                if (submask[idx] == 0xF) ws.put_bits(1, 1);
                else { ws.put_bits(0, 1); ws.put_bits(submask[idx], 4); }
            }
        }
    }
    put_ueg(wm, nz); // ZBRLE trailing run
    wm.align(); wx.align(); wy.align(); ws.align();
    *mode_len = wm.pos >> 3; *mvx_len = wx.pos >> 3;
    *mvy_len = wy.pos >> 3; *sbim_len = ws.pos >> 3;
}

// Append n (code, bitlen) symbols MSB-first at *bitpos in out (pre-zeroed).
void dsv1n_pack_symbols(const uint64_t* codes, const int32_t* lens, int32_t n,
                        uint8_t* out, uint32_t outcap, uint32_t* bitpos) {
    BitWriter w(out, outcap);
    w.pos = *bitpos;
    for (int32_t i = 0; i < n; i++) w.put_bits(codes[i], lens[i]);
    *bitpos = w.pos;
}

} // extern "C"
