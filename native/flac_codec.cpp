// Native FLAC codec (decoder + encoder), part of the audio engine.
//
// The reference decodes non-WAV audio through libsndfile/ffmpeg
// (rvc/lib/utils.py:37-50, infer.py format export); neither exists in this
// environment, so FLAC support is implemented from the format spec
// (https://xiph.org/flac/format.html) in C++ and bound via ctypes
// (rvc_tpu/utils/native.py). mp3/ogg/m4a still require an external ffmpeg.
//
// Decoder: full subset used by real encoders — constant / verbatim / fixed
// (orders 0-4) / LPC (1-32) subframes, rice partitions (4- and 5-bit params
// + escape codes), wasted bits, all four channel assignments, 8/12/16/20/24
// bps. CRCs are parsed but not verified (decode speed; inputs are local
// files, not a network stream).
//
// Encoder: 16-bit, fixed order-2 prediction with per-frame rice parameter
// search, independent channels, 4096-sample frames, correct CRC-8/CRC-16 so
// any standard FLAC tool can read the output.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace flac {

// ---------------------------------------------------------------------------
// bit reader
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  int64_t size;
  int64_t byte = 0;
  int bit = 0;  // bits consumed within current byte (MSB-first)
  bool error = false;

  BitReader(const uint8_t* d, int64_t n) : data(d), size(n) {}

  bool eof() const { return byte >= size; }

  uint32_t read_bits(int n) {
    uint32_t v = 0;
    while (n > 0) {
      if (byte >= size) { error = true; return 0; }
      const int avail = 8 - bit;
      const int take = n < avail ? n : avail;
      const uint32_t chunk =
          (data[byte] >> (avail - take)) & ((1u << take) - 1u);
      v = (v << take) | chunk;
      bit += take;
      n -= take;
      if (bit == 8) { bit = 0; ++byte; }
    }
    return v;
  }

  uint64_t read_bits64(int n) {
    uint64_t v = 0;
    if (n > 32) {
      v = read_bits(n - 32);
      v = (v << 32) | read_bits(32);
    } else {
      v = read_bits(n);
    }
    return v;
  }

  int32_t read_signed(int n) {
    const uint32_t v = read_bits(n);
    const uint32_t sign = 1u << (n - 1);
    return (v & sign) ? static_cast<int32_t>(v | ~(sign * 2 - 1)) :
                        static_cast<int32_t>(v);
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (!error) {
      if (byte >= size) { error = true; return 0; }
      if ((data[byte] >> (7 - bit)) & 1) {
        ++bit;
        if (bit == 8) { bit = 0; ++byte; }
        return q;
      }
      ++q;
      ++bit;
      if (bit == 8) { bit = 0; ++byte; }
    }
    return 0;
  }

  void align() {
    if (bit) { bit = 0; ++byte; }
  }

  uint64_t read_utf8() {
    const uint32_t b0 = read_bits(8);
    int extra = 0;
    uint64_t v = 0;
    if (b0 < 0x80) return b0;
    else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
    else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
    else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
    else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
    else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
    else if (b0 == 0xFE) { v = 0; extra = 6; }
    else { error = true; return 0; }
    for (int i = 0; i < extra; ++i) v = (v << 6) | (read_bits(8) & 0x3F);
    return v;
  }
};

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
};

const int kFixedCoefs[5][4] = {
    {0, 0, 0, 0}, {1, 0, 0, 0}, {2, -1, 0, 0}, {3, -3, 1, 0}, {4, -6, 4, -1}};

bool decode_residual(BitReader& br, int block_size, int pred_order,
                     int32_t* res) {
  const int method = br.read_bits(2);
  if (method > 1) return false;
  const int param_bits = method == 0 ? 4 : 5;
  const uint32_t escape = method == 0 ? 0xF : 0x1F;
  const int part_order = br.read_bits(4);
  const int n_parts = 1 << part_order;
  if (block_size % n_parts) return false;
  int idx = 0;
  for (int p = 0; p < n_parts; ++p) {
    int count = block_size >> part_order;
    if (p == 0) count -= pred_order;
    if (count < 0) return false;
    const uint32_t param = br.read_bits(param_bits);
    if (param == escape) {
      const int raw = br.read_bits(5);
      for (int i = 0; i < count; ++i)
        res[idx++] = raw ? br.read_signed(raw) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        const uint32_t q = br.read_unary();
        const uint32_t u = (q << param) | br.read_bits(param);
        res[idx++] = static_cast<int32_t>((u >> 1) ^ (~(u & 1) + 1));
      }
    }
    if (br.error) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps, int64_t* out) {
  if (br.read_bits(1) != 0) return false;  // padding bit
  const int type = br.read_bits(6);
  int wasted = 0;
  if (br.read_bits(1)) wasted = 1 + br.read_unary();
  bps -= wasted;
  if (bps <= 0 || bps > 32) return false;

  std::vector<int32_t> res(block_size);
  if (type == 0) {  // constant
    const int32_t v = br.read_signed(bps);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // verbatim
    for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // fixed
    const int order = type & 0x07;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!decode_residual(br, block_size, order, res.data())) return false;
    const int* c = kFixedCoefs[order];
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += c[j] * out[i - 1 - j];
      out[i] = pred + res[i - order];
    }
  } else if (type & 0x20) {  // LPC
    const int order = (type & 0x1F) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    const int precision = br.read_bits(4) + 1;
    if (precision > 16) return false;
    const int shift = br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int32_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    if (!decode_residual(br, block_size, order, res.data())) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j)
        pred += static_cast<int64_t>(coef[j]) * out[i - 1 - j];
      out[i] = (pred >> shift) + res[i - order];
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  return !br.error;
}

const uint32_t kBlockSizes[16] = {0,   192, 576,  1152, 2304, 4608, 0,    0,
                                  256, 512, 1024, 2048, 4096, 8192, 16384,
                                  32768};
const uint32_t kSampleRates[16] = {0,     88200, 176400, 192000, 8000, 16000,
                                   22050, 24000, 32000,  44100,  48000, 96000,
                                   0,     0,     0,      0};
const int kBpsTable[8] = {0, 8, 12, 0, 16, 20, 24, 32};

// Decode an entire FLAC stream. Returns total decoded samples per channel,
// or -1 on error. Query mode: out == nullptr fills info only.
int64_t decode(const uint8_t* data, int64_t size, float* out,
               int64_t max_samples, StreamInfo* info) {
  if (size < 42 || std::memcmp(data, "fLaC", 4) != 0) return -1;
  int64_t pos = 4;
  StreamInfo si;
  bool last = false;
  while (!last && pos + 4 <= size) {
    const uint8_t h = data[pos];
    last = h & 0x80;
    const int type = h & 0x7F;
    const uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8)
                         | data[pos + 3];
    pos += 4;
    // the claimed block length must fit in the buffer BEFORE any field is
    // parsed — a truncated file can otherwise drive s[10..17] past the
    // allocation (heap OOB read)
    if (pos + static_cast<int64_t>(len) > size) return -1;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* s = data + pos;
      si.sample_rate = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4);
      si.channels = ((s[12] >> 1) & 0x7) + 1;
      si.bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      si.total_samples = (static_cast<uint64_t>(s[13] & 0x0F) << 32)
                         | (static_cast<uint64_t>(s[14]) << 24)
                         | (s[15] << 16) | (s[16] << 8) | s[17];
    }
    pos += len;
  }
  if (si.sample_rate == 0 || si.channels < 1 || si.channels > 8) return -1;
  if (info) *info = si;
  if (out == nullptr) return static_cast<int64_t>(si.total_samples);

  BitReader br(data + pos, size - pos);
  const float scale = 1.0f / static_cast<float>(1u << (si.bps - 1));
  int64_t written = 0;
  std::vector<std::vector<int64_t>> ch(si.channels);

  while (!br.eof() && written < max_samples) {
    // frame sync
    if (br.read_bits(14) != 0x3FFE) break;
    br.read_bits(1);  // reserved
    br.read_bits(1);  // blocking strategy
    const uint32_t bs_code = br.read_bits(4);
    const uint32_t sr_code = br.read_bits(4);
    const uint32_t ch_code = br.read_bits(4);
    const uint32_t bps_code = br.read_bits(3);
    br.read_bits(1);  // reserved
    br.read_utf8();   // frame/sample number
    uint32_t block_size = kBlockSizes[bs_code];
    if (bs_code == 6) block_size = br.read_bits(8) + 1;
    else if (bs_code == 7) block_size = br.read_bits(16) + 1;
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    br.read_bits(8);  // CRC-8 (unverified)
    if (br.error || block_size == 0) break;

    int bps = kBpsTable[bps_code];
    if (bps == 0) bps = si.bps;

    int n_ch = si.channels;
    int assign = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
    if (ch_code <= 7) n_ch = ch_code + 1;
    else if (ch_code == 8) { n_ch = 2; assign = 1; }
    else if (ch_code == 9) { n_ch = 2; assign = 2; }
    else if (ch_code == 10) { n_ch = 2; assign = 3; }
    else break;
    if (n_ch != si.channels) break;

    for (int c = 0; c < n_ch; ++c) {
      ch[c].resize(block_size);
      int sub_bps = bps;
      if ((assign == 1 && c == 1) || (assign == 2 && c == 0) ||
          (assign == 3 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, block_size, sub_bps, ch[c].data())) {
        br.error = true;
        break;
      }
    }
    if (br.error) break;
    br.align();
    br.read_bits(16);  // CRC-16 (unverified)

    // stereo decorrelation
    if (assign == 1) {        // left/side: right = left - side
      for (uint32_t i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (assign == 2) { // right/side: left = right + side
      for (uint32_t i = 0; i < block_size; ++i) {
        const int64_t s = ch[0][i];
        ch[0][i] = ch[1][i] + s;
      }
    } else if (assign == 3) { // mid/side
      for (uint32_t i = 0; i < block_size; ++i) {
        const int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    for (uint32_t i = 0; i < block_size && written < max_samples; ++i) {
      for (int c = 0; c < n_ch; ++c)
        out[written * n_ch + c] = static_cast<float>(ch[c][i]) * scale;
      ++written;
    }
  }
  return written;
}

// ---------------------------------------------------------------------------
// encoder (16-bit, fixed order-2, rice order-0 partitions)
// ---------------------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t>& buf;
  uint8_t cur = 0;
  int nbits = 0;

  explicit BitWriter(std::vector<uint8_t>& b) : buf(b) {}

  void write_bits(uint64_t v, int n) {
    for (int i = n - 1; i >= 0; --i) {
      cur = (cur << 1) | ((v >> i) & 1);
      if (++nbits == 8) { buf.push_back(cur); cur = 0; nbits = 0; }
    }
  }
  void align() { while (nbits) write_bits(0, 1); }
};

uint8_t crc8(const uint8_t* d, size_t n) {
  uint8_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= d[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? static_cast<uint8_t>((crc << 1) ^ 0x07)
                         : static_cast<uint8_t>(crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* d, size_t n) {
  uint16_t crc = 0;
  for (size_t i = 0; i < n; ++i) {
    crc ^= static_cast<uint16_t>(d[i]) << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? static_cast<uint16_t>((crc << 1) ^ 0x8005)
                           : static_cast<uint16_t>(crc << 1);
  }
  return crc;
}

void write_utf8(BitWriter& bw, uint64_t v) {
  if (v < 0x80) { bw.write_bits(v, 8); return; }
  int extra = v < 0x800 ? 1 : v < 0x10000 ? 2 : v < 0x200000 ? 3
              : v < 0x4000000 ? 4 : 5;
  static const uint32_t lead[6] = {0, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC};
  bw.write_bits(lead[extra] | (v >> (6 * extra)), 8);
  for (int i = extra - 1; i >= 0; --i)
    bw.write_bits(0x80 | ((v >> (6 * i)) & 0x3F), 8);
}

int best_rice_param(const int32_t* res, int n) {
  if (n == 0) return 0;
  uint64_t sum = 0;
  for (int i = 0; i < n; ++i) {
    const uint32_t u = (static_cast<uint32_t>(res[i]) << 1)
                       ^ (res[i] >> 31);
    sum += u;
  }
  const double mean = static_cast<double>(sum) / n;
  int k = 0;
  while ((1u << (k + 1)) < mean + 1 && k < 14) ++k;
  return k;
}

void write_rice(BitWriter& bw, const int32_t* res, int n, int k) {
  for (int i = 0; i < n; ++i) {
    const uint32_t u = (static_cast<uint32_t>(res[i]) << 1) ^ (res[i] >> 31);
    const uint32_t q = u >> k;
    for (uint32_t j = 0; j < q; ++j) bw.write_bits(0, 1);
    bw.write_bits(1, 1);
    if (k) bw.write_bits(u & ((1u << k) - 1), k);
  }
}

// Encode interleaved float [-1,1] samples to 16-bit FLAC. Returns the number
// of bytes written (query with out == nullptr for an upper bound).
int64_t encode(const float* in, int64_t n_samples, int channels,
               uint32_t sample_rate, uint8_t* out, int64_t max_out) {
  if (channels < 1 || channels > 8 || n_samples <= 0) return -1;
  // true worst case with the 4-bit rice param capped at 14: an order-2
  // residual of full-scale Nyquist content zigzags to ~2^18, i.e.
  // (u>>14) + 1 + 14 = 30 bits/sample — 3 bytes/sample is NOT a bound
  // (confirmed by a +1/-1 alternating repro). Use 4 bytes/sample + headers.
  const int64_t bound = 64 + n_samples * channels * 4 + (n_samples / 4096 + 2) * 48;
  if (out == nullptr) return bound;

  std::vector<uint8_t> buf;
  buf.reserve(bound);
  const char magic[4] = {'f', 'L', 'a', 'C'};
  buf.insert(buf.end(), magic, magic + 4);

  // STREAMINFO (last metadata block)
  uint8_t si[38] = {0};
  si[0] = 0x80;  // last | type 0
  si[3] = 34;
  const uint32_t bs = 4096;
  si[4] = bs >> 8; si[5] = bs & 0xFF;    // min block
  si[6] = bs >> 8; si[7] = bs & 0xFF;    // max block
  // min/max frame size: 0 (unknown)
  si[14] = (sample_rate >> 12) & 0xFF;
  si[15] = (sample_rate >> 4) & 0xFF;
  si[16] = ((sample_rate & 0xF) << 4) | ((channels - 1) << 1)
           | (((16 - 1) >> 4) & 1);
  si[17] = ((16 - 1) & 0xF) << 4 | ((n_samples >> 32) & 0xF);
  si[18] = (n_samples >> 24) & 0xFF;
  si[19] = (n_samples >> 16) & 0xFF;
  si[20] = (n_samples >> 8) & 0xFF;
  si[21] = n_samples & 0xFF;
  // md5 left zero (optional integrity)
  buf.insert(buf.end(), si, si + 38);

  std::vector<int32_t> pcm(channels * bs);
  std::vector<int32_t> res(bs);
  uint64_t frame_idx = 0;
  for (int64_t start = 0; start < n_samples; start += bs) {
    const int cur = static_cast<int>(
        start + bs <= n_samples ? bs : n_samples - start);
    const size_t frame_begin = buf.size();
    BitWriter bw(buf);
    bw.write_bits(0x3FFE, 14);
    bw.write_bits(0, 1);   // reserved
    bw.write_bits(0, 1);   // fixed blocksize stream
    bw.write_bits(cur == static_cast<int>(bs) ? 12 : 7, 4);  // 4096 or 16-bit
    // sample rate: put code 0 (read from STREAMINFO)
    bw.write_bits(0, 4);
    bw.write_bits(channels - 1, 4);  // independent channels
    bw.write_bits(4, 3);             // 16 bps
    bw.write_bits(0, 1);
    write_utf8(bw, frame_idx++);
    if (cur != static_cast<int>(bs)) bw.write_bits(cur - 1, 16);
    bw.align();
    buf.push_back(crc8(buf.data() + frame_begin, buf.size() - frame_begin));

    BitWriter body(buf);
    for (int c = 0; c < channels; ++c) {
      for (int i = 0; i < cur; ++i) {
        float v = in[(start + i) * channels + c];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        pcm[i] = static_cast<int32_t>(std::lrintf(v * 32767.0f));
      }
      const int order = cur > 2 ? 2 : 0;
      body.write_bits(0, 1);                 // padding
      body.write_bits(order ? (0x08 | order) : 0x08, 6);  // fixed subframe
      body.write_bits(0, 1);                 // no wasted bits
      for (int i = 0; i < order; ++i) body.write_bits(
          static_cast<uint32_t>(pcm[i]) & 0xFFFF, 16);
      const int n_res = cur - order;
      if (order == 2) {
        for (int i = 2; i < cur; ++i)
          res[i - 2] = pcm[i] - 2 * pcm[i - 1] + pcm[i - 2];
      } else {
        for (int i = 0; i < cur; ++i) res[i] = pcm[i];
      }
      const int k = best_rice_param(res.data(), n_res);
      body.write_bits(0, 2);  // rice method (4-bit params)
      body.write_bits(0, 4);  // partition order 0
      body.write_bits(k, 4);
      write_rice(body, res.data(), n_res, k);
    }
    body.align();
    const uint16_t c16 = crc16(buf.data() + frame_begin,
                               buf.size() - frame_begin);
    buf.push_back(c16 >> 8);
    buf.push_back(c16 & 0xFF);
  }

  if (static_cast<int64_t>(buf.size()) > max_out) return -1;
  std::memcpy(out, buf.data(), buf.size());
  return static_cast<int64_t>(buf.size());
}

}  // namespace flac

extern "C" {

// Probe a FLAC buffer: fills sr/channels/bps/total_samples, returns 0/-1.
int32_t flac_probe(const uint8_t* data, int64_t size, int32_t* sample_rate,
                   int32_t* channels, int32_t* bps, int64_t* total_samples) {
  flac::StreamInfo si;
  if (flac::decode(data, size, nullptr, 0, &si) < 0) return -1;
  *sample_rate = static_cast<int32_t>(si.sample_rate);
  *channels = si.channels;
  *bps = si.bps;
  *total_samples = static_cast<int64_t>(si.total_samples);
  return 0;
}

// Decode to interleaved float32; returns samples-per-channel written.
int64_t flac_decode(const uint8_t* data, int64_t size, float* out,
                    int64_t max_samples) {
  return flac::decode(data, size, out, max_samples, nullptr);
}

// Encode interleaved float32 -> FLAC bytes; out==nullptr returns the bound.
int64_t flac_encode(const float* in, int64_t n_samples, int32_t channels,
                    int32_t sample_rate, uint8_t* out, int64_t max_out) {
  return flac::encode(in, n_samples, channels,
                      static_cast<uint32_t>(sample_rate), out, max_out);
}

}  // extern "C"
