// rlds_reader.cpp — native RLDS/TFRecord data-loader for roboticattack_tpu.
//
// The reference outsources its data plane to TensorFlow's C++ tf.data runtime
// (SURVEY.md §2.6: "TF C++ tf.data pipeline"); this is the framework-native
// equivalent: a dependency-light TFRecord reader + tf.Example wire-format
// parser + libjpeg image decoder, with a multi-threaded prefetch ring so the
// Python host loop never blocks on file IO while the TPU computes.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 on this image).
//
// TFRecord framing:   u64 length | u32 masked_crc(length) | payload |
//                     u32 masked_crc(payload)
// tf.Example proto:   Example{1: Features{1: map<string, Feature>}}
//                     Feature{1: BytesList, 2: FloatList, 3: Int64List}
// (hand-rolled varint/wire parsing — protobuf runtime not required)

#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>

#include <jpeglib.h>  // must follow <cstdio>/<cstddef> (uses FILE/size_t)
#include <pthread.h>
#include <deque>
#include <array>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------- protobuf --
struct Slice {
  const uint8_t* data;
  size_t len;
};

bool read_varint(const uint8_t*& p, const uint8_t* end, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (p < end && shift < 64) {
    uint8_t byte = *p++;
    result |= static_cast<uint64_t>(byte & 0x7f) << shift;
    if (!(byte & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
  }
  return false;
}

bool skip_field(const uint8_t*& p, const uint8_t* end, uint32_t wire_type) {
  uint64_t tmp;
  switch (wire_type) {
    case 0:  // varint
      return read_varint(p, end, &tmp);
    case 1:  // 64-bit
      if (end - p < 8) return false;
      p += 8;
      return true;
    case 2:  // length-delimited
      if (!read_varint(p, end, &tmp) || static_cast<uint64_t>(end - p) < tmp) return false;
      p += tmp;
      return true;
    case 5:  // 32-bit
      if (end - p < 4) return false;
      p += 4;
      return true;
    default:
      return false;
  }
}

// Iterate the fields of a message, invoking fn(field_no, wire_type, p, end)
// for length-delimited payloads; other wire types are skipped.
template <typename Fn>
bool for_each_field(Slice msg, Fn fn) {
  const uint8_t* p = msg.data;
  const uint8_t* end = msg.data + msg.len;
  while (p < end) {
    uint64_t tag;
    if (!read_varint(p, end, &tag)) return false;
    uint32_t field = static_cast<uint32_t>(tag >> 3);
    uint32_t wire = static_cast<uint32_t>(tag & 7);
    if (wire == 2) {
      uint64_t len;
      if (!read_varint(p, end, &len) || static_cast<uint64_t>(end - p) < len) return false;
      fn(field, Slice{p, static_cast<size_t>(len)});
      p += len;
    } else {
      const uint8_t* before = p;
      if (!skip_field(p, end, wire)) return false;
      (void)before;
    }
  }
  return true;
}

enum FeatureKind { kBytes = 1, kFloat = 2, kInt64 = 3, kNone = 0 };

struct FeatureValue {
  FeatureKind kind = kNone;
  std::vector<Slice> bytes_values;    // kBytes
  std::vector<float> float_values;    // kFloat
  std::vector<int64_t> int64_values;  // kInt64
};

void parse_float_list(Slice body, std::vector<float>* out) {
  for_each_field(body, [&](uint32_t field, Slice payload) {
    if (field == 1) {  // packed floats
      size_t n = payload.len / 4;
      size_t base = out->size();
      out->resize(base + n);
      memcpy(out->data() + base, payload.data, n * 4);
    }
  });
}

void parse_int64_list(Slice body, std::vector<int64_t>* out) {
  // packed varints
  for_each_field(body, [&](uint32_t field, Slice payload) {
    if (field == 1) {
      const uint8_t* p = payload.data;
      const uint8_t* end = payload.data + payload.len;
      uint64_t v;
      while (p < end && read_varint(p, end, &v)) out->push_back(static_cast<int64_t>(v));
    }
  });
}

void parse_bytes_list(Slice body, std::vector<Slice>* out) {
  for_each_field(body, [&](uint32_t field, Slice payload) {
    if (field == 1) out->push_back(payload);
  });
}

// Find feature `key` in a serialized tf.Example.
bool find_feature(Slice example, const char* key, FeatureValue* out) {
  size_t key_len = strlen(key);
  bool found = false;
  for_each_field(example, [&](uint32_t f1, Slice features) {
    if (f1 != 1 || found) return;  // Example.features
    for_each_field(features, [&](uint32_t f2, Slice entry) {
      if (f2 != 1 || found) return;  // map entry
      Slice entry_key{nullptr, 0}, entry_val{nullptr, 0};
      for_each_field(entry, [&](uint32_t f3, Slice payload) {
        if (f3 == 1) entry_key = payload;
        if (f3 == 2) entry_val = payload;
      });
      if (entry_key.len != key_len || memcmp(entry_key.data, key, key_len) != 0) return;
      // entry_val is a Feature: oneof bytes/float/int64 list
      for_each_field(entry_val, [&](uint32_t f4, Slice body) {
        if (f4 == 1) {
          out->kind = kBytes;
          parse_bytes_list(body, &out->bytes_values);
        } else if (f4 == 2) {
          out->kind = kFloat;
          parse_float_list(body, &out->float_values);
        } else if (f4 == 3) {
          out->kind = kInt64;
          parse_int64_list(body, &out->int64_values);
        }
      });
      found = true;
    });
  });
  return found && out->kind != kNone;
}

// ---------------------------------------------------------------- tfrecord --
// CRC32C (Castagnoli) + the TFRecord mask — validating the length CRC before
// allocating means a corrupt/bit-flipped header is a clean per-file stop, not
// a multi-petabyte std::bad_alloc that terminates the process.
// table init is a C++11 magic static: each NativeRLDSReader runs its own
// prefetcher thread, and two readers opened concurrently must not race the
// table fill (an unsynchronized done-flag could publish before the writes on
// a weakly-ordered host, turning into spurious CRC mismatches that silently
// drop the rest of a shard)
static const uint32_t* crc32c_table() {
  static const std::array<uint32_t, 256> table = [] {
    std::array<uint32_t, 256> t{};
    for (uint32_t i = 0; i < 256; i++) {
      uint32_t crc = i;
      for (int k = 0; k < 8; k++) crc = (crc & 1) ? (crc >> 1) ^ 0x82F63B78u : crc >> 1;
      t[i] = crc;
    }
    return t;
  }();
  return table.data();
}

static uint32_t crc32c(const uint8_t* data, size_t n) {
  const uint32_t* table = crc32c_table();
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; i++) crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

static uint32_t tfrecord_masked_crc(const uint8_t* data, size_t n) {
  uint32_t c = crc32c(data, n);
  return ((c >> 15) | (c << 17)) + 0xa282ead8u;
}

// practical ceiling: one RLDS episode is tens of MB at most; anything bigger
// in the length field is corruption even if its CRC were somehow valid
static const uint64_t kMaxRecordBytes = 1ull << 31;  // 2 GB

struct RecordReader {
  FILE* f = nullptr;
  bool next(std::vector<uint8_t>* out) {
    uint8_t header[12];
    if (fread(header, 1, 12, f) != 12) return false;  // len + masked crc(len)
    uint64_t len;
    uint32_t len_crc;
    memcpy(&len, header, 8);
    memcpy(&len_crc, header + 8, 4);
    if (len_crc != tfrecord_masked_crc(header, 8) || len > kMaxRecordBytes) {
      fprintf(stderr, "[rlds_reader] corrupt record header (len=%llu), "
              "stopping this file\n", (unsigned long long)len);
      return false;  // prefetcher advances to the next shard
    }
    out->resize(len);
    if (len && fread(out->data(), 1, len, f) != len) return false;
    uint8_t crc[4];
    uint32_t payload_crc;
    if (fread(crc, 1, 4, f) != 4) return false;
    memcpy(&payload_crc, crc, 4);
    if (payload_crc != tfrecord_masked_crc(out->data(), len)) {
      fprintf(stderr, "[rlds_reader] payload CRC mismatch, stopping this file\n");
      return false;  // framing may be shifted; do not resync blindly
    }
    return true;
  }
};

// ------------------------------------------------------------- prefetcher --
struct Prefetcher {
  std::vector<std::string> paths;
  size_t path_idx = 0;
  RecordReader reader;
  std::deque<std::vector<uint8_t>*> queue;
  size_t capacity = 64;
  bool done = false, stop = false;
  pthread_t thread;
  pthread_mutex_t mu = PTHREAD_MUTEX_INITIALIZER;
  pthread_cond_t cv_push = PTHREAD_COND_INITIALIZER;
  pthread_cond_t cv_pop = PTHREAD_COND_INITIALIZER;

  bool open_next_file() {
    while (path_idx < paths.size()) {
      if (reader.f) fclose(reader.f);
      reader.f = fopen(paths[path_idx++].c_str(), "rb");
      if (reader.f) return true;
    }
    return false;
  }

  static void* run(void* arg) {
    auto* self = static_cast<Prefetcher*>(arg);
    if (!self->open_next_file()) {
      pthread_mutex_lock(&self->mu);
      self->done = true;
      pthread_cond_broadcast(&self->cv_pop);
      pthread_mutex_unlock(&self->mu);
      return nullptr;
    }
    for (;;) {
      auto* rec = new std::vector<uint8_t>();
      bool ok = self->reader.next(rec);
      while (!ok) {
        if (!self->open_next_file()) break;
        ok = self->reader.next(rec);
      }
      pthread_mutex_lock(&self->mu);
      if (!ok || self->stop) {
        delete rec;
        self->done = true;
        pthread_cond_broadcast(&self->cv_pop);
        pthread_mutex_unlock(&self->mu);
        return nullptr;
      }
      while (self->queue.size() >= self->capacity && !self->stop)
        pthread_cond_wait(&self->cv_push, &self->mu);
      if (self->stop) {
        delete rec;
        self->done = true;
        pthread_cond_broadcast(&self->cv_pop);
        pthread_mutex_unlock(&self->mu);
        return nullptr;
      }
      self->queue.push_back(rec);
      pthread_cond_signal(&self->cv_pop);
      pthread_mutex_unlock(&self->mu);
    }
  }

  std::vector<uint8_t>* pop() {
    pthread_mutex_lock(&mu);
    while (queue.empty() && !done) pthread_cond_wait(&cv_pop, &mu);
    std::vector<uint8_t>* rec = nullptr;
    if (!queue.empty()) {
      rec = queue.front();
      queue.pop_front();
      pthread_cond_signal(&cv_push);
    }
    pthread_mutex_unlock(&mu);
    return rec;
  }
};

}  // namespace

// ------------------------------------------------------------------ C ABI --
extern "C" {

void* rlds_reader_open(const char** paths, int n_paths, int prefetch_depth) {
  auto* p = new Prefetcher();
  for (int i = 0; i < n_paths; i++) p->paths.emplace_back(paths[i]);
  if (prefetch_depth > 0) p->capacity = static_cast<size_t>(prefetch_depth);
  pthread_create(&p->thread, nullptr, &Prefetcher::run, p);
  return p;
}

// Returns a malloc'd record buffer (caller frees via rlds_free) or NULL at EOF.
uint8_t* rlds_reader_next(void* handle, int64_t* out_len) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::vector<uint8_t>* rec = p->pop();
  if (!rec) {
    *out_len = 0;
    return nullptr;
  }
  auto* buf = static_cast<uint8_t*>(malloc(rec->size()));
  memcpy(buf, rec->data(), rec->size());
  *out_len = static_cast<int64_t>(rec->size());
  delete rec;
  return buf;
}

void rlds_free(void* buf) { free(buf); }

void rlds_reader_close(void* handle) {
  auto* p = static_cast<Prefetcher*>(handle);
  pthread_mutex_lock(&p->mu);
  p->stop = true;
  pthread_cond_broadcast(&p->cv_push);
  pthread_cond_broadcast(&p->cv_pop);
  pthread_mutex_unlock(&p->mu);
  pthread_join(p->thread, nullptr);
  for (auto* rec : p->queue) delete rec;
  if (p->reader.f) fclose(p->reader.f);
  delete p;
}

// Extract a feature. kind: 1=bytes (first element), 2=float list, 3=int64 list.
// For bytes: *out points INTO record (no copy); for float/int64: malloc'd.
int rlds_example_feature(const uint8_t* record, int64_t record_len, const char* key,
                         int* out_kind, const uint8_t** out_ptr, int64_t* out_count) {
  FeatureValue fv;
  if (!find_feature(Slice{record, static_cast<size_t>(record_len)}, key, &fv)) return -1;
  *out_kind = fv.kind;
  if (fv.kind == kBytes) {
    if (fv.bytes_values.empty()) return -1;
    *out_ptr = fv.bytes_values[0].data;
    *out_count = static_cast<int64_t>(fv.bytes_values[0].len);
  } else if (fv.kind == kFloat) {
    auto* buf = static_cast<float*>(malloc(fv.float_values.size() * 4));
    memcpy(buf, fv.float_values.data(), fv.float_values.size() * 4);
    *out_ptr = reinterpret_cast<uint8_t*>(buf);
    *out_count = static_cast<int64_t>(fv.float_values.size());
  } else {
    auto* buf = static_cast<int64_t*>(malloc(fv.int64_values.size() * 8));
    memcpy(buf, fv.int64_values.data(), fv.int64_values.size() * 8);
    *out_ptr = reinterpret_cast<uint8_t*>(buf);
    *out_count = static_cast<int64_t>(fv.int64_values.size());
  }
  return 0;
}

// Number of elements in a (possibly repeated) feature; -1 if absent.
// RLDS episodes store one bytes element per STEP (e.g. steps/observation/image
// holds T JPEGs), so readers need the repeat count, not just element 0.
int64_t rlds_example_feature_count(const uint8_t* record, int64_t record_len,
                                   const char* key) {
  FeatureValue fv;
  if (!find_feature(Slice{record, static_cast<size_t>(record_len)}, key, &fv)) return -1;
  if (fv.kind == kBytes) return static_cast<int64_t>(fv.bytes_values.size());
  if (fv.kind == kFloat) return static_cast<int64_t>(fv.float_values.size());
  return static_cast<int64_t>(fv.int64_values.size());
}

// Indexed access to one element of a repeated BYTES feature.
// *out points INTO record (no copy). Returns -1 when absent/out of range or
// the feature isn't bytes.
int rlds_example_bytes_at(const uint8_t* record, int64_t record_len, const char* key,
                          int64_t index, const uint8_t** out_ptr, int64_t* out_len) {
  FeatureValue fv;
  if (!find_feature(Slice{record, static_cast<size_t>(record_len)}, key, &fv)) return -1;
  if (fv.kind != kBytes) return -1;
  if (index < 0 || index >= static_cast<int64_t>(fv.bytes_values.size())) return -1;
  *out_ptr = fv.bytes_values[index].data;
  *out_len = static_cast<int64_t>(fv.bytes_values[index].len);
  return 0;
}

// libjpeg's default error_exit() calls exit(); corrupt records must instead
// surface as a -1 return, so install a setjmp-based error manager.
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

static void jpeg_error_longjmp(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(mgr->setjmp_buffer, 1);
}

// Decode a JPEG into caller-provided RGB buffer (or probe dims with out=NULL).
int rlds_jpeg_decode(const uint8_t* jpg, int64_t len, uint8_t* out, int* out_h,
                     int* out_w, int* out_c) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_longjmp;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(jpg), static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;
  *out_h = static_cast<int>(cinfo.image_height);
  *out_w = static_cast<int>(cinfo.image_width);
  *out_c = 3;
  if (out == nullptr) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_start_decompress(&cinfo);
  int stride = cinfo.output_width * cinfo.output_components;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"

// --- Lanczos-3 separable resampler ------------------------------------------------
// The kernel family of tf.image.resize(method='lanczos3', antialias=True) and
// PIL's Image.LANCZOS (obs_transforms.py:45-58): sinc(x)*sinc(x/3) windows,
// support scaled by the downsampling factor (antialias). Float32 math,
// horizontal then vertical pass, round-clamp to uint8.

static double lanczos3_kernel(double x) {
  if (x <= -3.0 || x >= 3.0) return 0.0;
  if (x == 0.0) return 1.0;
  double pix = M_PI * x;
  return 3.0 * sin(pix) * sin(pix / 3.0) / (pix * pix);
}

struct ResampleTaps {
  int ksize;                  // taps per output coordinate
  std::vector<int> start;     // first input index per output coordinate
  std::vector<float> weight;  // [out_size * ksize], zero-padded at borders
};

static void lanczos3_taps(int in_size, int out_size, ResampleTaps* taps) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 3.0 * filterscale;
  int ksize = static_cast<int>(ceil(support)) * 2 + 1;
  taps->ksize = ksize;
  taps->start.assign(out_size, 0);
  taps->weight.assign(static_cast<size_t>(out_size) * ksize, 0.0f);
  for (int i = 0; i < out_size; i++) {
    double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    taps->start[i] = xmin;
    double total = 0.0;
    std::vector<double> w(xmax - xmin);
    for (int x = xmin; x < xmax; x++) {
      w[x - xmin] = lanczos3_kernel((x + 0.5 - center) / filterscale);
      total += w[x - xmin];
    }
    for (int x = 0; x < xmax - xmin; x++) {
      taps->weight[static_cast<size_t>(i) * ksize + x] =
          static_cast<float>(total != 0.0 ? w[x] / total : 0.0);
    }
  }
}

// in: [h, w, 3] uint8 -> out: [size, size, 3] uint8
static void lanczos3_resize_rgb(const uint8_t* in, int h, int w, int size,
                                uint8_t* out) {
  ResampleTaps hx, vx;
  lanczos3_taps(w, size, &hx);
  lanczos3_taps(h, size, &vx);
  // horizontal pass: [h, size, 3] float
  std::vector<float> mid(static_cast<size_t>(h) * size * 3);
  for (int y = 0; y < h; y++) {
    const uint8_t* row = in + static_cast<size_t>(y) * w * 3;
    float* mrow = mid.data() + static_cast<size_t>(y) * size * 3;
    for (int i = 0; i < size; i++) {
      const float* wgt = hx.weight.data() + static_cast<size_t>(i) * hx.ksize;
      int x0 = hx.start[i];
      float acc[3] = {0.f, 0.f, 0.f};
      for (int k = 0; k < hx.ksize; k++) {
        float g = wgt[k];
        if (g == 0.f) continue;
        const uint8_t* px = row + static_cast<size_t>(x0 + k) * 3;
        acc[0] += g * px[0];
        acc[1] += g * px[1];
        acc[2] += g * px[2];
      }
      mrow[i * 3 + 0] = acc[0];
      mrow[i * 3 + 1] = acc[1];
      mrow[i * 3 + 2] = acc[2];
    }
  }
  // vertical pass + round/clamp
  for (int j = 0; j < size; j++) {
    const float* wgt = vx.weight.data() + static_cast<size_t>(j) * vx.ksize;
    int y0 = vx.start[j];
    uint8_t* orow = out + static_cast<size_t>(j) * size * 3;
    for (int i = 0; i < size * 3; i++) {
      float acc = 0.f;
      for (int k = 0; k < vx.ksize; k++) {
        float g = wgt[k];
        if (g == 0.f) continue;
        acc += g * mid[(static_cast<size_t>(y0 + k) * size * 3) + i];
      }
      int v = static_cast<int>(acc + 0.5f);
      orow[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

extern "C" {

// Decode a JPEG and Lanczos-3 resize to [size, size, 3] RGB in one native
// call (out must hold size*size*3 bytes). Returns -1 on decode failure.
int rlds_jpeg_decode_resized(const uint8_t* jpg, int64_t len, int size,
                             uint8_t* out) {
  int h = 0, w = 0, c = 0;
  if (rlds_jpeg_decode(jpg, len, nullptr, &h, &w, &c) != 0) return -1;
  if (h == size && w == size) {
    return rlds_jpeg_decode(jpg, len, out, &h, &w, &c);
  }
  std::vector<uint8_t> full(static_cast<size_t>(h) * w * 3);
  if (rlds_jpeg_decode(jpg, len, full.data(), &h, &w, &c) != 0) return -1;
  lanczos3_resize_rgb(full.data(), h, w, size, out);
  return 0;
}

}  // extern "C"
