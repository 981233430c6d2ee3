// bagloader — native batch assembler for patch-feature bags.
//
// The TPU host-side data path (SURVEY.md §5 "Host-side data path"): reads
// .npy feature files (float32/float16), pads each bag to the bucket length,
// and assembles whole padded batches into caller-provided buffers with a
// thread pool — replacing the reference's Python DataLoader worker processes
// (ref runner/base_handler.py:239-241) with zero-copy native IO.
//
// C ABI (ctypes):
//   bl_read_npy_info(path, &rows, &cols)            -> 0 on success
//   bl_load_bag(path, out, max_rows, cols)          -> rows written (<0 error)
//   bl_assemble_batch(paths, n_bags, target_n, dim,
//                     out_feats, out_mask, out_len, n_threads) -> 0 on success
//
// Build:  g++ -O3 -shared -fPIC -o libbagloader.so bagloader.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// Minimal .npy parser: v1.0/v2.0 headers, C-order, dtypes <f4 / <f2.
struct NpyInfo {
  long rows = 0;
  long cols = 0;
  int word_size = 0;  // 4 for f4, 2 for f2
  long data_offset = 0;
  bool ok = false;
};

NpyInfo parse_npy_header(FILE* f) {
  NpyInfo info;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return info;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return info;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return info;
    header_len = b[0] | (b[1] << 8);
    info.data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return info;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    info.data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return info;

  if (header.find("'fortran_order': True") != std::string::npos) return info;
  size_t dt = header.find("'descr':");
  if (dt == std::string::npos) return info;
  if (header.find("<f4", dt) != std::string::npos ||
      header.find("|f4", dt) != std::string::npos) {
    info.word_size = 4;
  } else if (header.find("<f2", dt) != std::string::npos) {
    info.word_size = 2;
  } else {
    return info;
  }
  size_t sh = header.find("'shape':");
  if (sh == std::string::npos) return info;
  size_t lp = header.find('(', sh);
  size_t rp = header.find(')', sh);
  if (lp == std::string::npos || rp == std::string::npos) return info;
  std::string shape = header.substr(lp + 1, rp - lp - 1);
  long dims[4] = {0, 0, 0, 0};
  int ndim = 0;
  const char* p = shape.c_str();
  while (*p && ndim < 4) {
    while (*p == ' ' || *p == ',') p++;
    if (*p == '\0') break;
    dims[ndim++] = strtol(p, const_cast<char**>(&p), 10);
  }
  if (ndim == 1) {
    info.rows = 1;
    info.cols = dims[0];
  } else if (ndim == 2) {
    info.rows = dims[0];
    info.cols = dims[1];
  } else {
    return info;
  }
  info.ok = true;
  return info;
}

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while ((mant & 0x400) == 0) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3ff;
      bits = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000 | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  memcpy(&out, &bits, sizeof(out));
  return out;
}

// Read up to max_rows rows into out (float32), return rows actually written.
long load_bag_impl(const char* path, float* out, long max_rows, long expect_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info = parse_npy_header(f);
  if (!info.ok || (expect_cols > 0 && info.cols != expect_cols)) {
    fclose(f);
    return -2;
  }
  long rows = info.rows < max_rows ? info.rows : max_rows;
  long n = rows * info.cols;
  if (fseek(f, info.data_offset, SEEK_SET) != 0) {
    fclose(f);
    return -3;
  }
  if (info.word_size == 4) {
    if ((long)fread(out, 4, n, f) != n) {
      fclose(f);
      return -4;
    }
  } else {
    std::vector<uint16_t> tmp(n);
    if ((long)fread(tmp.data(), 2, n, f) != n) {
      fclose(f);
      return -4;
    }
    for (long i = 0; i < n; i++) out[i] = half_to_float(tmp[i]);
  }
  fclose(f);
  return rows;
}

// --------------------------------------------------------------------------
// .q8npz support: numpy's savez container is an uncompressed (stored) ZIP
// whose members are plain .npy files.  numpy writes zip64 local headers
// (32-bit sizes = 0xFFFFFFFF, real sizes in the 0x0001 extra field), stored
// method, no data descriptors — exactly what the walker below parses.  The
// members of a pre-quantized store (data/convert.py / data/extract.py):
//   q.npy     int8  [N, D]   quantized features
//   scale.npy f32   [N]      per-patch dequant scales
//   inv.npy   f32   [N]      per-patch 1/l2norm sidecar
// --------------------------------------------------------------------------

struct ZipMember {
  long data_offset = 0;
  long size = 0;
};

// Walk local file headers; fills q/scale/inv member spans. Returns false on
// any unsupported feature (compression, data descriptors).
bool locate_q8_members(FILE* f, ZipMember* q, ZipMember* scale, ZipMember* inv) {
  if (fseek(f, 0, SEEK_SET) != 0) return false;
  bool have_q = false;
  while (true) {
    unsigned char h[30];
    if (fread(h, 1, 30, f) != 30) break;
    uint32_t sig = h[0] | (h[1] << 8) | (h[2] << 16) | ((uint32_t)h[3] << 24);
    if (sig != 0x04034b50) break;  // central directory reached (or junk)
    uint16_t flags = h[6] | (h[7] << 8);
    uint16_t method = h[8] | (h[9] << 8);
    uint32_t csize32 = h[18] | (h[19] << 8) | (h[20] << 16) | ((uint32_t)h[21] << 24);
    uint32_t usize32 = h[22] | (h[23] << 8) | (h[24] << 16) | ((uint32_t)h[25] << 24);
    uint16_t fl = h[26] | (h[27] << 8);
    uint16_t el = h[28] | (h[29] << 8);
    if (method != 0 || (flags & 0x8)) return false;  // stored, no descriptor
    std::string name(fl, '\0');
    if (fread(&name[0], 1, fl, f) != fl) return false;
    std::string extra(el, '\0');
    if (el && fread(&extra[0], 1, el, f) != el) return false;
    long csize = csize32;
    if (csize32 == 0xFFFFFFFFu || usize32 == 0xFFFFFFFFu) {
      // zip64 extra: id 0x0001, then uncompressed(8) + compressed(8)
      bool found = false;
      size_t p = 0;
      while (p + 4 <= extra.size()) {
        uint16_t id = (uint8_t)extra[p] | ((uint8_t)extra[p + 1] << 8);
        uint16_t sz = (uint8_t)extra[p + 2] | ((uint8_t)extra[p + 3] << 8);
        if (id == 0x0001 && sz >= 16) {
          uint64_t u = 0, c = 0;
          memcpy(&u, &extra[p + 4], 8);
          memcpy(&c, &extra[p + 12], 8);
          csize = (long)c;
          (void)u;
          found = true;
          break;
        }
        p += 4 + sz;
      }
      if (!found) return false;
    }
    long data_off = ftell(f);
    ZipMember m{data_off, csize};
    if (name == "q.npy") { *q = m; have_q = true; }
    else if (name == "scale.npy") *scale = m;
    else if (name == "inv.npy") *inv = m;
    if (fseek(f, data_off + csize, SEEK_SET) != 0) return false;
  }
  return have_q && scale->size > 0 && inv->size > 0;
}

// Parse the .npy header of a member at `m.data_offset`; expect_word_size
// 1 (i1) or 4 (f4).
NpyInfo parse_member_npy(FILE* f, const ZipMember& m, int expect_word_size) {
  NpyInfo bad;
  if (fseek(f, m.data_offset, SEEK_SET) != 0) return bad;
  // reuse the main parser but accept i1 as well
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return bad;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return bad;
  int major = magic[6];
  uint32_t header_len = 0;
  long hdr_base = 10;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return bad;
    header_len = b[0] | (b[1] << 8);
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return bad;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    hdr_base = 12;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return bad;
  if (header.find("'fortran_order': True") != std::string::npos) return bad;
  NpyInfo info;
  if (header.find("i1'") != std::string::npos) info.word_size = 1;
  else if (header.find("<f4") != std::string::npos ||
           header.find("|f4", 0) != std::string::npos) info.word_size = 4;
  else return bad;
  if (info.word_size != expect_word_size) return bad;
  size_t sh = header.find("'shape':");
  if (sh == std::string::npos) return bad;
  size_t lp = header.find('(', sh);
  size_t rp = header.find(')', sh);
  if (lp == std::string::npos || rp == std::string::npos) return bad;
  std::string shape = header.substr(lp + 1, rp - lp - 1);
  long dims[4] = {0, 0, 0, 0};
  int ndim = 0;
  const char* p = shape.c_str();
  while (*p && ndim < 4) {
    while (*p == ' ' || *p == ',') p++;
    if (*p == '\0') break;
    dims[ndim++] = strtol(p, const_cast<char**>(&p), 10);
  }
  if (ndim == 1) { info.rows = dims[0]; info.cols = 1; }
  else if (ndim == 2) { info.rows = dims[0]; info.cols = dims[1]; }
  else return bad;
  info.data_offset = m.data_offset + hdr_base + header_len;
  info.ok = true;
  return info;
}

// Read up to max_rows quantized rows (+sidecars); returns rows or <0.
long load_q8_impl(const char* path, int8_t* q_out, float* scale_out,
                  float* inv_out, long max_rows, long expect_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  ZipMember mq, ms, mi;
  if (!locate_q8_members(f, &mq, &ms, &mi)) { fclose(f); return -2; }
  NpyInfo iq = parse_member_npy(f, mq, 1);
  if (!iq.ok || (expect_cols > 0 && iq.cols != expect_cols)) { fclose(f); return -3; }
  NpyInfo is = parse_member_npy(f, ms, 4);
  NpyInfo ii = parse_member_npy(f, mi, 4);
  if (!is.ok || !ii.ok || is.rows != iq.rows || ii.rows != iq.rows) {
    fclose(f);
    return -4;
  }
  long rows = iq.rows < max_rows ? iq.rows : max_rows;
  if (fseek(f, iq.data_offset, SEEK_SET) != 0 ||
      (long)fread(q_out, 1, rows * iq.cols, f) != rows * iq.cols) {
    fclose(f);
    return -5;
  }
  if (fseek(f, is.data_offset, SEEK_SET) != 0 ||
      (long)fread(scale_out, 4, rows, f) != rows) { fclose(f); return -6; }
  if (fseek(f, ii.data_offset, SEEK_SET) != 0 ||
      (long)fread(inv_out, 4, rows, f) != rows) { fclose(f); return -7; }
  fclose(f);
  return rows;
}

}  // namespace

extern "C" {

int bl_read_q8_info(const char* path, long* rows, long* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  ZipMember mq, ms, mi;
  if (!locate_q8_members(f, &mq, &ms, &mi)) { fclose(f); return -2; }
  NpyInfo iq = parse_member_npy(f, mq, 1);
  fclose(f);
  if (!iq.ok) return -3;
  *rows = iq.rows;
  *cols = iq.cols;
  return 0;
}

// Assemble a padded int8 batch with sidecars from ';'-joined .q8npz paths.
//   out_q:     [n_bags, target_n, dim] int8
//   out_scale: [n_bags, target_n] f32
//   out_inv:   [n_bags, target_n] f32
//   out_mask:  [n_bags, target_n] u8
int bl_assemble_q8_batch(const char** paths, long n_bags, long target_n,
                         long dim, int8_t* out_q, float* out_scale,
                         float* out_inv, uint8_t* out_mask, long* out_len,
                         int n_threads) {
  std::atomic<long> next(0);
  std::atomic<int> err(0);

  auto worker = [&]() {
    while (true) {
      long b = next.fetch_add(1);
      if (b >= n_bags) break;
      int8_t* qd = out_q + b * target_n * dim;
      float* sd = out_scale + b * target_n;
      float* id = out_inv + b * target_n;
      uint8_t* msk = out_mask + b * target_n;
      memset(qd, 0, target_n * dim);
      memset(sd, 0, sizeof(float) * target_n);
      memset(id, 0, sizeof(float) * target_n);
      memset(msk, 0, target_n);
      long written = 0;
      std::string multi(paths[b]);
      size_t start = 0;
      while (start < multi.size() && written < target_n) {
        size_t sep = multi.find(';', start);
        std::string one = multi.substr(
            start, sep == std::string::npos ? std::string::npos : sep - start);
        if (!one.empty()) {
          long r = load_q8_impl(one.c_str(), qd + written * dim, sd + written,
                                id + written, target_n - written, dim);
          if (r < 0) {
            err.store((int)r);
            break;
          }
          written += r;
        }
        if (sep == std::string::npos) break;
        start = sep + 1;
      }
      out_len[b] = written;
      for (long i = 0; i < written; i++) msk[i] = 1;
    }
  };

  int nt = n_threads > 0 ? n_threads : 4;
  std::vector<std::thread> threads;
  for (int i = 0; i < nt; i++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return err.load();
}

int bl_read_npy_info(const char* path, long* rows, long* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info = parse_npy_header(f);
  fclose(f);
  if (!info.ok) return -2;
  *rows = info.rows;
  *cols = info.cols;
  return 0;
}

long bl_load_bag(const char* path, float* out, long max_rows, long cols) {
  return load_bag_impl(path, out, max_rows, cols);
}

// Assemble a padded batch:
//   paths: n_bags file paths (each bag may span several files separated by
//          ';' — slides of one patient are concatenated, ref
//          dataset/PatchWSI.py:205-215)
//   out_feats: [n_bags, target_n, dim] zero-initialised by callee
//   out_mask:  [n_bags, target_n] uint8
//   out_len:   [n_bags] actual rows per bag
int bl_assemble_batch(const char** paths, long n_bags, long target_n, long dim,
                      float* out_feats, uint8_t* out_mask, long* out_len,
                      int n_threads) {
  std::atomic<long> next(0);
  std::atomic<int> err(0);

  auto worker = [&]() {
    while (true) {
      long b = next.fetch_add(1);
      if (b >= n_bags) break;
      float* dst = out_feats + b * target_n * dim;
      memset(dst, 0, sizeof(float) * target_n * dim);
      uint8_t* msk = out_mask + b * target_n;
      memset(msk, 0, target_n);
      long written = 0;
      std::string multi(paths[b]);
      size_t start = 0;
      while (start < multi.size() && written < target_n) {
        size_t sep = multi.find(';', start);
        std::string one = multi.substr(
            start, sep == std::string::npos ? std::string::npos : sep - start);
        if (!one.empty()) {
          long r = load_bag_impl(one.c_str(), dst + written * dim,
                                 target_n - written, dim);
          if (r < 0) {
            err.store((int)r);
            break;
          }
          written += r;
        }
        if (sep == std::string::npos) break;
        start = sep + 1;
      }
      out_len[b] = written;
      for (long i = 0; i < written; i++) msk[i] = 1;
    }
  };

  int nt = n_threads > 0 ? n_threads : 4;
  std::vector<std::thread> threads;
  for (int i = 0; i < nt; i++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return err.load();
}

}  // extern "C"
