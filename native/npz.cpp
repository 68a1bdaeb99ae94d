// Native .npz shard reader — host data-path core.
//
// The training loader reads uncompressed .npz shards (tell_tpu/data/
// records.py). NumPy's reader goes through Python zipfile: per-field
// member lookup, CRC32 verification, and several small Python-level file
// reads — ~1k zip-member reads per batch at multi-chip DP batch sizes,
// which exceeds the per-step host budget long before the arrays are big.
// (The reference never hits this because its loader pays a MongoDB TCP
// round-trip per article instead — SURVEY.md §2.5.)
//
// This reader mmaps the shard once, parses the zip central directory and
// every member's .npy header at open, and serves reads as a single memcpy
// from the mapping. No CRC (the data was written locally by us, and
// os.replace made the write atomic), no per-read parsing, no Python in
// the loop. Loaded via ctypes from tell_tpu/data/native.py; falls back to
// the pure-Python ShardReader on any parse anomaly (compressed members,
// zip64, fortran order) by returning null/-1.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#if defined(__x86_64__)
#include <immintrin.h>
#endif

namespace {

struct Member {
  std::string name;   // zip member name, ".npy" suffix stripped
  std::string descr;  // numpy dtype string, e.g. "<i4", "<U57", "|b1"
  int ndim = 0;
  int64_t shape[8] = {0};
  uint64_t data_off = 0;  // offset of raw array bytes in the file
  uint64_t nbytes = 0;    // raw array byte count
};

struct Npz {
  const unsigned char* map = nullptr;
  uint64_t size = 0;
  std::vector<Member> members;
};

uint16_t rd16(const unsigned char* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}
uint32_t rd32(const unsigned char* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}

// Parse the .npy header at `off`; fills descr/ndim/shape and sets
// data_off/nbytes (nbytes = member payload size minus header). Returns
// false on anything unexpected (wrong magic, fortran order, >8 dims).
bool parse_npy(const unsigned char* p, uint64_t off, uint64_t member_size,
               Member* m) {
  if (member_size < 10) return false;
  const unsigned char* h = p + off;
  static const unsigned char magic[6] = {0x93, 'N', 'U', 'M', 'P', 'Y'};
  if (memcmp(h, magic, 6) != 0) return false;
  unsigned major = h[6];
  uint64_t hlen, hstart;
  if (major == 1) {
    hlen = rd16(h + 8);
    hstart = 10;
  } else {  // v2/v3: 4-byte header length
    if (member_size < 12) return false;
    hlen = rd32(h + 8);
    hstart = 12;
  }
  if (hstart + hlen > member_size) return false;
  std::string hdr((const char*)h + hstart, hlen);

  // 'descr': quoted dtype string
  size_t d = hdr.find("'descr'");
  if (d == std::string::npos) return false;
  size_t q1 = hdr.find('\'', d + 7);
  if (q1 == std::string::npos) return false;
  size_t q2 = hdr.find('\'', q1 + 1);
  if (q2 == std::string::npos) return false;
  m->descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  // structured dtypes (descr is a list) start with '[' — not supported
  if (m->descr.empty()) return false;

  // 'fortran_order': must be False (we only ever write C-order)
  size_t f = hdr.find("'fortran_order'");
  if (f == std::string::npos) return false;
  if (hdr.find("True", f) < hdr.find(',', f)) return false;

  // 'shape': tuple of ints
  size_t s = hdr.find("'shape'");
  if (s == std::string::npos) return false;
  size_t o = hdr.find('(', s);
  size_t c = hdr.find(')', o);
  if (o == std::string::npos || c == std::string::npos) return false;
  m->ndim = 0;
  size_t i = o + 1;
  while (i < c) {
    while (i < c && (hdr[i] == ' ' || hdr[i] == ',')) ++i;
    if (i >= c) break;
    if (hdr[i] < '0' || hdr[i] > '9') return false;
    if (m->ndim >= 8) return false;
    int64_t v = 0;
    while (i < c && hdr[i] >= '0' && hdr[i] <= '9')
      v = v * 10 + (hdr[i++] - '0');
    m->shape[m->ndim++] = v;
  }

  m->data_off = off + hstart + hlen;
  m->nbytes = member_size - hstart - hlen;
  return true;
}

}  // namespace

extern "C" {

void* tnt_npz_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 22) {
    close(fd);
    return nullptr;
  }
  uint64_t size = (uint64_t)st.st_size;
  void* map = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);  // the mapping outlives the descriptor — no fd pressure
  if (map == MAP_FAILED) return nullptr;
  const unsigned char* p = (const unsigned char*)map;

  Npz* z = new Npz();
  z->map = p;
  z->size = size;

  // End-of-central-directory: scan back for PK\x05\x06 (comment <= 64K;
  // ours is empty, but be tolerant)
  uint64_t scan_lo = size > 66000 ? size - 66000 : 0;
  int64_t eocd = -1;
  for (int64_t i = (int64_t)size - 22; i >= (int64_t)scan_lo; --i) {
    if (p[i] == 'P' && p[i + 1] == 'K' && p[i + 2] == 5 && p[i + 3] == 6) {
      eocd = i;
      break;
    }
  }
  if (eocd < 0) goto fail;
  {
    uint16_t n_entries = rd16(p + eocd + 10);
    uint32_t cd_size = rd32(p + eocd + 12);
    uint32_t cd_off = rd32(p + eocd + 16);
    if (n_entries == 0xFFFF || cd_off == 0xFFFFFFFFu ||
        cd_size == 0xFFFFFFFFu)
      goto fail;  // zip64 — fall back to Python
    if ((uint64_t)cd_off + cd_size > size) goto fail;

    uint64_t off = cd_off;
    for (int e = 0; e < n_entries; ++e) {
      if (off + 46 > size || rd32(p + off) != 0x02014b50u) goto fail;
      uint16_t method = rd16(p + off + 10);
      uint32_t csize = rd32(p + off + 20);
      uint32_t usize = rd32(p + off + 24);
      uint16_t fnlen = rd16(p + off + 28);
      uint16_t exlen = rd16(p + off + 30);
      uint16_t cmlen = rd16(p + off + 32);
      uint32_t lho = rd32(p + off + 42);
      if (method != 0 || csize != usize) goto fail;  // stored members only
      if (csize == 0xFFFFFFFFu || lho == 0xFFFFFFFFu) goto fail;  // zip64
      std::string name((const char*)p + off + 46, fnlen);

      // local header gives the real extra-field length for the data offset
      if ((uint64_t)lho + 30 > size || rd32(p + lho) != 0x04034b50u)
        goto fail;
      uint16_t lfn = rd16(p + lho + 26);
      uint16_t lex = rd16(p + lho + 28);
      uint64_t data = (uint64_t)lho + 30 + lfn + lex;
      if (data + usize > size) goto fail;

      Member m;
      if (name.size() > 4 && name.compare(name.size() - 4, 4, ".npy") == 0)
        m.name = name.substr(0, name.size() - 4);
      else
        m.name = name;
      if (!parse_npy(p, data, usize, &m)) goto fail;
      z->members.push_back(std::move(m));

      off += 46 + fnlen + exlen + cmlen;
    }
  }
  return z;

fail:
  munmap((void*)p, size);
  delete z;
  return nullptr;
}

void tnt_npz_close(void* h) {
  Npz* z = (Npz*)h;
  if (!z) return;
  if (z->map) munmap((void*)z->map, z->size);
  delete z;
}

int tnt_npz_count(void* h) { return (int)((Npz*)h)->members.size(); }

// Member i's name into buf; returns name length (or -1 if cap too small).
int tnt_npz_name(void* h, int i, char* buf, int cap) {
  Npz* z = (Npz*)h;
  if (i < 0 || i >= (int)z->members.size()) return -1;
  const std::string& n = z->members[i].name;
  if ((int)n.size() + 1 > cap) return -1;
  memcpy(buf, n.c_str(), n.size() + 1);
  return (int)n.size();
}

// Member i's dtype string into dbuf and shape into shape[]; returns ndim
// (0 for scalars) or -1.
int tnt_npz_info(void* h, int i, char* dbuf, int dcap, int64_t* shape,
                 int scap) {
  Npz* z = (Npz*)h;
  if (i < 0 || i >= (int)z->members.size()) return -1;
  const Member& m = z->members[i];
  if ((int)m.descr.size() + 1 > dcap || m.ndim > scap) return -1;
  memcpy(dbuf, m.descr.c_str(), m.descr.size() + 1);
  for (int d = 0; d < m.ndim; ++d) shape[d] = m.shape[d];
  return m.ndim;
}

// Copy member i's raw array bytes into dst (caller sizes it from info);
// returns the byte count or -1.
int64_t tnt_npz_read(void* h, int i, void* dst) {
  Npz* z = (Npz*)h;
  if (i < 0 || i >= (int)z->members.size()) return -1;
  const Member& m = z->members[i];
  memcpy(dst, z->map + m.data_off, m.nbytes);
  return (int64_t)m.nbytes;
}

// Gather n ragged members into one fixed row-major [n, row_elems] batch
// buffer — the batch-assembly hot loop (pack_batch) without Python in it.
// Row k copies min(member_elems, row_elems) elements of member idx[k] from
// shard handles[k] (idx[k] < 0 => all-pad row), then fills the tail with
// the 4-byte `pad` pattern (low 2 bytes for elem_bytes == 2).
// src_f16_to_f32 == 1 converts half -> float while copying (elem_bytes
// must be 4; member byte counts are interpreted as halves).
// Returns total elements copied (pads excluded) or -1.

namespace {

void f16_to_f32_scalar(const uint16_t* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    uint16_t h = src[i];
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t expo = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (expo == 0) {
      if (mant == 0) {
        bits = sign;  // +/- 0
      } else {        // subnormal: normalize
        int shift = 0;
        while (!(mant & 0x400)) {
          mant <<= 1;
          ++shift;
        }
        mant &= 0x3FF;
        bits = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
      }
    } else if (expo == 0x1F) {
      bits = sign | 0x7F800000u | (mant << 13);  // inf / nan
    } else {
      bits = sign | ((expo - 15 + 127) << 23) | (mant << 13);
    }
    memcpy(dst + i, &bits, 4);
  }
}

#if defined(__x86_64__)
__attribute__((target("f16c"))) void f16_to_f32_f16c(const uint16_t* src,
                                                     float* dst, int64_t n) {
  int64_t i = 0;
  for (; i + 8 <= n; i += 8) {
    __m128i h = _mm_loadu_si128((const __m128i*)(src + i));
    _mm256_storeu_ps(dst + i, _mm256_cvtph_ps(h));
  }
  f16_to_f32_scalar(src + i, dst + i, n - i);
}
#endif

void f16_to_f32(const uint16_t* src, float* dst, int64_t n) {
#if defined(__x86_64__)
  static const bool has_f16c = __builtin_cpu_supports("f16c");
  if (has_f16c) {
    f16_to_f32_f16c(src, dst, n);
    return;
  }
#endif
  f16_to_f32_scalar(src, dst, n);
}

void pattern_fill(void* dst, int64_t n_elems, int elem_bytes, uint32_t pad) {
  if (elem_bytes == 4) {
    uint32_t* p = (uint32_t*)dst;
    for (int64_t i = 0; i < n_elems; ++i) p[i] = pad;
  } else {
    uint16_t v = (uint16_t)pad;
    uint16_t* p = (uint16_t*)dst;
    for (int64_t i = 0; i < n_elems; ++i) p[i] = v;
  }
}

}  // namespace

int64_t tnt_npz_gather_pad(void** handles, const int32_t* idx, int n,
                           void* dst, int64_t row_elems, int elem_bytes,
                           uint32_t pad, int src_f16_to_f32) {
  if (elem_bytes != 2 && elem_bytes != 4) return -1;
  if (src_f16_to_f32 && elem_bytes != 4) return -1;
  int src_bytes = src_f16_to_f32 ? 2 : elem_bytes;
  int64_t total = 0;
  char* out = (char*)dst;
  for (int k = 0; k < n; ++k, out += row_elems * elem_bytes) {
    if (idx[k] < 0) {
      pattern_fill(out, row_elems, elem_bytes, pad);
      continue;
    }
    Npz* z = (Npz*)handles[k];
    if (!z || idx[k] >= (int)z->members.size()) return -1;
    const Member& m = z->members[idx[k]];
    int64_t elems = (int64_t)m.nbytes / src_bytes;
    if (elems > row_elems) elems = row_elems;
    const unsigned char* src = z->map + m.data_off;
    if (src_f16_to_f32)
      f16_to_f32((const uint16_t*)src, (float*)out, elems);
    else
      memcpy(out, src, elems * elem_bytes);
    pattern_fill(out + elems * elem_bytes, row_elems - elems, elem_bytes,
                 pad);
    total += elems;
  }
  return total;
}

// Copy n members in one call (one FFI round-trip per example instead of
// per field). dsts[k] receives member idx[k]; every dst must already be
// sized per tnt_npz_info. Returns total bytes copied or -1.
int64_t tnt_npz_read_multi(void* h, const int32_t* idx, void** dsts,
                           int n) {
  Npz* z = (Npz*)h;
  int64_t total = 0;
  for (int k = 0; k < n; ++k) {
    int i = idx[k];
    if (i < 0 || i >= (int)z->members.size()) return -1;
    const Member& m = z->members[i];
    memcpy(dsts[k], z->map + m.data_off, m.nbytes);
    total += (int64_t)m.nbytes;
  }
  return total;
}

}  // extern "C"
