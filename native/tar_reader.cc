// Native tar-shard reader — streaming member iteration for the
// multi-sensor shard pipeline (data/shard_dataset.py).
//
// The Python tarfile module re-parses headers and allocates per member in
// the interpreter; this reader walks the 512-byte header blocks in C++
// and hands back (name, payload) pairs through a simple handle-based C
// ABI. Handles plain ustar/pax archives (pax/GNU metadata entries are
// skipped; long names beyond the ustar prefix scheme fall back to the
// Python path).
//
//   void* gdl_tar_open(const char* path)
//   int   gdl_tar_next(void* h, char* name_out /*>=257B*/, int64_t* size)
//           -> 1 member available, 0 end-of-archive, <0 error
//   int   gdl_tar_read(void* h, uint8_t* buf)   // read current payload
//   void  gdl_tar_close(void* h)

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

struct TarHandle {
  FILE* f = nullptr;
  int64_t payload_size = 0;   // size of the current member
  int64_t payload_left = 0;   // unread bytes of current member (incl. pad)
};

int64_t parse_octal(const char* p, int n) {
  // tar numeric fields: octal ASCII, or base-256 when the high bit is set
  if (static_cast<unsigned char>(p[0]) & 0x80) {
    int64_t v = static_cast<unsigned char>(p[0]) & 0x7f;
    for (int i = 1; i < n; ++i) v = (v << 8) | static_cast<unsigned char>(p[i]);
    return v;
  }
  int64_t v = 0;
  for (int i = 0; i < n && p[i]; ++i) {
    if (p[i] == ' ') continue;
    if (p[i] < '0' || p[i] > '7') break;
    v = v * 8 + (p[i] - '0');
  }
  return v;
}

bool zero_block(const char* b) {
  for (int i = 0; i < 512; ++i)
    if (b[i]) return false;
  return true;
}

void skip_payload(TarHandle* h) {
  if (h->payload_left > 0) {
    fseek(h->f, h->payload_left, SEEK_CUR);
    h->payload_left = 0;
  }
}

}  // namespace

extern "C" {

void* gdl_tar_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* h = new TarHandle();
  h->f = f;
  return h;
}

int gdl_tar_next(void* handle, char* name_out, int64_t* size_out) {
  auto* h = static_cast<TarHandle*>(handle);
  skip_payload(h);
  char block[512];
  while (true) {
    if (fread(block, 1, 512, h->f) != 512) return 0;  // truncated = EOF
    if (zero_block(block)) return 0;                  // end marker
    const char typeflag = block[156];
    int64_t size = parse_octal(block + 124, 12);
    int64_t padded = (size + 511) & ~int64_t(511);
    const bool is_file = typeflag == '0' || typeflag == '\0';
    if (!is_file) {  // dirs, pax headers, GNU long names: skip
      fseek(h->f, padded, SEEK_CUR);
      continue;
    }
    // ustar name: prefix (345, 155 bytes) + '/' + name (0, 100 bytes)
    char name[257];
    size_t pos = 0;
    if (block[345]) {
      size_t plen = strnlen(block + 345, 155);
      memcpy(name, block + 345, plen);
      pos = plen;
      name[pos++] = '/';
    }
    size_t nlen = strnlen(block, 100);
    memcpy(name + pos, block, nlen);
    name[pos + nlen] = '\0';
    strcpy(name_out, name);
    *size_out = size;
    h->payload_size = size;
    h->payload_left = padded;
    return 1;
  }
}

int gdl_tar_read(void* handle, uint8_t* buf) {
  auto* h = static_cast<TarHandle*>(handle);
  if (h->payload_left < h->payload_size) return -1;  // already consumed
  if (fread(buf, 1, h->payload_size, h->f) != size_t(h->payload_size)) return -2;
  h->payload_left -= h->payload_size;
  return 0;
}

void gdl_tar_close(void* handle) {
  auto* h = static_cast<TarHandle*>(handle);
  if (h->f) fclose(h->f);
  delete h;
}

}  // extern "C"
