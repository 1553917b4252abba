// fastpng: minimal, fast PNG encoder for RGB8 frames (video host-IO path).
//
// Replaces PIL's encoder in the orbit-video writer (reference async PNG
// pool: /root/reference/render.py:4412-4417). PIL spends most of its
// time in libpng's adaptive five-filter search plus zlib; frames here
// are mostly smooth/black, so a three-way filter heuristic
// (None/Sub/Up, libpng's minimum-sum rule) plus a fast deflate gets
// within a few percent of the default ratio at a fraction of the time.
// Single-threaded by design: the render host has one core and the
// AsyncPNGWriter already overlaps encode with TPU compute.
//
// Compression backend: libdeflate when the build defines USE_LIBDEFLATE
// (whole-buffer API, ~3x zlib's throughput), else zlib streaming. The
// Python builder (bhr_tpu/native/__init__.py) tries libdeflate first
// and falls back, so the .so always links against what the host has.
//
// C ABI only (consumed via ctypes): no exceptions across the boundary.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#ifdef USE_LIBDEFLATE
#include <libdeflate.h>
#else
#include <zlib.h>
#endif

namespace {

inline void put_u32be(uint8_t *p, uint32_t v) {
  p[0] = static_cast<uint8_t>(v >> 24);
  p[1] = static_cast<uint8_t>(v >> 16);
  p[2] = static_cast<uint8_t>(v >> 8);
  p[3] = static_cast<uint8_t>(v);
}

inline uint32_t chunk_crc(const uint8_t *type_and_payload, size_t n) {
#ifdef USE_LIBDEFLATE
  return static_cast<uint32_t>(
      libdeflate_crc32(0, type_and_payload, n));
#else
  uint32_t crc = crc32(0L, Z_NULL, 0);
  return crc32(crc, type_and_payload, static_cast<uInt>(n));
#endif
}

// Append one PNG chunk (length, type, payload, crc) to buf at *pos.
void append_chunk(uint8_t *buf, size_t *pos, const char type[4],
                  const uint8_t *payload, uint32_t len) {
  put_u32be(buf + *pos, len);
  std::memcpy(buf + *pos + 4, type, 4);
  if (len) std::memcpy(buf + *pos + 8, payload, len);
  put_u32be(buf + *pos + 8 + len, chunk_crc(buf + *pos + 4, 4 + len));
  *pos += 12 + len;
}

// Sum of |signed byte| over a buffer; written as a plain reduction so
// the compiler vectorizes it (psadbw-class throughput under -O3).
uint64_t abs_sum(const uint8_t *p, size_t n) {
  uint64_t s = 0;
  for (size_t x = 0; x < n; ++x) {
    const uint8_t b = p[x];
    s += b < 128 ? b : 256u - b;
  }
  return s;
}

// Filter one row into dst (1 filter byte + rowbytes), choosing among
// None/Sub/Up by minimum sum (libpng's heuristic). prev == nullptr for
// the first row. Each candidate is built by its own branch-free loop so
// -O3 auto-vectorizes; the old fused single loop ran byte-serial.
void filter_row(const uint8_t *cur, const uint8_t *prev, size_t rowbytes,
                uint8_t *dst, uint8_t *scratch) {
  uint8_t *f_sub = scratch;
  uint8_t *f_up = scratch + rowbytes;

  f_sub[0] = cur[0];
  f_sub[1] = cur[1];
  f_sub[2] = cur[2];
  for (size_t x = 3; x < rowbytes; ++x) {
    f_sub[x] = static_cast<uint8_t>(cur[x] - cur[x - 3]);
  }
  const uint64_t s_sub = abs_sum(f_sub, rowbytes);
  const uint64_t s_none = abs_sum(cur, rowbytes);

  uint64_t s_up = ~0ULL;
  if (prev) {
    for (size_t x = 0; x < rowbytes; ++x) {
      f_up[x] = static_cast<uint8_t>(cur[x] - prev[x]);
    }
    s_up = abs_sum(f_up, rowbytes);
  }

  if (s_sub < s_none && s_sub <= s_up) {
    dst[0] = 1;
    std::memcpy(dst + 1, f_sub, rowbytes);
  } else if (s_up < s_none) {
    dst[0] = 2;
    std::memcpy(dst + 1, f_up, rowbytes);
  } else {
    dst[0] = 0;
    std::memcpy(dst + 1, cur, rowbytes);
  }
}

}  // namespace

extern "C" {

// Backend identifier for diagnostics/tests: 1 = libdeflate, 0 = zlib.
int fastpng_backend(void) {
#ifdef USE_LIBDEFLATE
  return 1;
#else
  return 0;
#endif
}

// Encode an interleaved RGB8 image (row-major, 3*width bytes per row)
// into a complete PNG byte stream.
//
// Returns 0 on success; fills *out (malloc'd, caller frees via
// fastpng_free) and *out_len. Nonzero return = error (no allocation).
int fastpng_encode_rgb8(const uint8_t *rgb, int32_t width, int32_t height,
                        int32_t level, uint8_t **out, size_t *out_len) {
  if (!rgb || !out || !out_len || width <= 0 || height <= 0) return 1;
  if (level < 0 || level > 9) level = 2;

  const size_t rowbytes = static_cast<size_t>(width) * 3;
  const size_t raw_len = (rowbytes + 1) * static_cast<size_t>(height);

#ifdef USE_LIBDEFLATE
  // libdeflate maps zlib levels 1..9 onto its 1..12 scale directly;
  // level 0 (store) needs level 0 too.
  struct libdeflate_compressor *comp = libdeflate_alloc_compressor(level);
  if (!comp) return 2;
  const size_t bound = libdeflate_zlib_compress_bound(comp, raw_len);
#else
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (deflateInit(&zs, level) != Z_OK) return 2;
  const size_t bound = deflateBound(&zs, static_cast<uLong>(raw_len));
  // avail_out is a uInt: a bound past 4 GiB would silently wrap and
  // truncate the IDAT. No real frame comes close; fail loudly.
  if (bound > 0xffffffffu) {
    deflateEnd(&zs);
    return 7;
  }
#endif

  // Layout: 8 (sig) + 25 (IHDR) + [12 + bound] (IDAT) + 12 (IEND).
  uint8_t *buf = static_cast<uint8_t *>(std::malloc(8 + 25 + 12 + bound + 12));
  // Scratch: two candidate filtered rows (+ the filtered image for the
  // whole-buffer backend).
  uint8_t *scratch = static_cast<uint8_t *>(std::malloc(2 * rowbytes));
#ifdef USE_LIBDEFLATE
  uint8_t *filtered = static_cast<uint8_t *>(std::malloc(raw_len));
#else
  uint8_t *filtered = static_cast<uint8_t *>(std::malloc(rowbytes + 1));
#endif
  if (!buf || !scratch || !filtered) {
    std::free(buf);
    std::free(scratch);
    std::free(filtered);
#ifdef USE_LIBDEFLATE
    libdeflate_free_compressor(comp);
#else
    deflateEnd(&zs);
#endif
    return 3;
  }

  size_t pos = 0;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  std::memcpy(buf, sig, 8);
  pos = 8;

  uint8_t ihdr[13];
  put_u32be(ihdr, static_cast<uint32_t>(width));
  put_u32be(ihdr + 4, static_cast<uint32_t>(height));
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 2;   // color type: truecolor RGB
  ihdr[10] = 0;  // compression
  ihdr[11] = 0;  // filter method
  ihdr[12] = 0;  // no interlace
  append_chunk(buf, &pos, "IHDR", ihdr, 13);

  const size_t idat_payload_at = pos + 8;
  size_t idat_len = 0;

#ifdef USE_LIBDEFLATE
  for (int32_t y = 0; y < height; ++y) {
    const uint8_t *cur = rgb + static_cast<size_t>(y) * rowbytes;
    const uint8_t *prev =
        y ? rgb + static_cast<size_t>(y - 1) * rowbytes : nullptr;
    filter_row(cur, prev, rowbytes,
               filtered + static_cast<size_t>(y) * (rowbytes + 1), scratch);
  }
  idat_len = libdeflate_zlib_compress(comp, filtered, raw_len,
                                      buf + idat_payload_at, bound);
  libdeflate_free_compressor(comp);
  std::free(scratch);
  std::free(filtered);
  if (idat_len == 0) {
    std::free(buf);
    return 4;
  }
#else
  zs.next_out = buf + idat_payload_at;
  zs.avail_out = static_cast<uInt>(bound);
  int zrc = Z_OK;
  for (int32_t y = 0; y < height && zrc == Z_OK; ++y) {
    const uint8_t *cur = rgb + static_cast<size_t>(y) * rowbytes;
    const uint8_t *prev =
        y ? rgb + static_cast<size_t>(y - 1) * rowbytes : nullptr;
    filter_row(cur, prev, rowbytes, filtered, scratch);
    zs.next_in = filtered;
    zs.avail_in = static_cast<uInt>(rowbytes + 1);
    zrc = deflate(&zs, y + 1 == height ? Z_FINISH : Z_NO_FLUSH);
  }
  std::free(scratch);
  std::free(filtered);
  // Only Z_STREAM_END proves the final Z_FINISH consumed everything;
  // stopping at Z_OK would mean a truncated stream reported as success.
  if (zrc != Z_STREAM_END) {
    std::free(buf);
    deflateEnd(&zs);
    return 4;
  }
  idat_len = static_cast<size_t>(zs.total_out);
  deflateEnd(&zs);
#endif

  // Patch the IDAT header/crc around the already-written payload.
  put_u32be(buf + pos, static_cast<uint32_t>(idat_len));
  std::memcpy(buf + pos + 4, "IDAT", 4);
  put_u32be(buf + pos + 8 + idat_len,
            chunk_crc(buf + pos + 4, 4 + idat_len));
  pos += 12 + idat_len;

  append_chunk(buf, &pos, "IEND", nullptr, 0);

  *out = buf;
  *out_len = pos;
  return 0;
}

void fastpng_free(uint8_t *p) { std::free(p); }

// Encode + write to path (single write call; the video resume protocol
// treats a missing/truncated frame as not-completed, so a plain write
// is sufficient — progress.json is the durability anchor).
int fastpng_write_rgb8(const uint8_t *rgb, int32_t width, int32_t height,
                       int32_t level, const char *path) {
  uint8_t *out = nullptr;
  size_t out_len = 0;
  const int rc = fastpng_encode_rgb8(rgb, width, height, level, &out, &out_len);
  if (rc != 0) return rc;
  std::FILE *fh = std::fopen(path, "wb");
  if (!fh) {
    fastpng_free(out);
    return 5;
  }
  const size_t wrote = std::fwrite(out, 1, out_len, fh);
  const int close_rc = std::fclose(fh);
  fastpng_free(out);
  return (wrote == out_len && close_rc == 0) ? 0 : 6;
}

}  // extern "C"
