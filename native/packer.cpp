// slacken_tpu native IO: FASTA/FASTQ parsing + 2-bit code packing.
//
// The reference framework runs entirely on the JVM with Spark executors
// doing string work; here the host-side hot path (feeding packed base codes
// to the TPU) is native C++ behind a C ABI consumed via ctypes
// (slacken_tpu/native.py). Parsing + encoding run at memory bandwidth,
// leaving Python to orchestrate device batches only.
//
// Encoding matches ops/encode.py: A=0 C=1 G=2 T=U=3, INVALID=4
// (BitRepresentation.scala:31-44 semantics).

#include <cstdint>
#include <cstring>

namespace {

constexpr uint8_t INVALID = 4;

struct Lut {
    uint8_t v[256];
    constexpr Lut() : v{} {
        for (int i = 0; i < 256; i++) v[i] = INVALID;
        v['A'] = v['a'] = 0;
        v['C'] = v['c'] = 1;
        v['G'] = v['g'] = 2;
        v['T'] = v['t'] = 3;
        v['U'] = v['u'] = 3;
    }
};
constexpr Lut LUT;

inline const char* find_nl(const char* p, const char* end) {
    const void* r = memchr(p, '\n', static_cast<size_t>(end - p));
    return r ? static_cast<const char*>(r) : end;
}

}  // namespace

extern "C" {

// Encode a raw byte string into 2-bit codes (INVALID for non-ACGTU).
void stpu_encode(const char* src, int64_t n, uint8_t* dst) {
    for (int64_t i = 0; i < n; i++) dst[i] = LUT.v[static_cast<uint8_t>(src[i])];
}

// First pass over a FASTQ chunk: count complete records and the maximum
// sequence length. The chunk must start at a record boundary ('@').
// Returns the byte offset of the first incomplete record (chunk remainder),
// or -1 on format error.
int64_t stpu_fastq_scan(const char* buf, int64_t n, int64_t* n_records, int64_t* max_len) {
    const char* p = buf;
    const char* end = buf + n;
    int64_t count = 0, maxl = 0;
    const char* last_complete = buf;
    while (p < end) {
        if (*p != '@') return -1;
        const char* h_end = find_nl(p, end);
        if (h_end == end) break;
        const char* s = h_end + 1;
        const char* s_end = find_nl(s, end);
        if (s_end == end) break;
        const char* plus = s_end + 1;
        const char* plus_end = find_nl(plus, end);
        if (plus_end == end) break;
        if (plus >= end || *plus != '+') return -1;
        const char* q = plus_end + 1;
        const char* q_end = find_nl(q, end);
        if (q_end == end && (end - q) < (s_end - s)) break;  // truncated quals
        int64_t slen = s_end - s;
        if (slen > maxl) maxl = slen;
        count++;
        p = (q_end == end) ? end : q_end + 1;
        last_complete = p;
    }
    *n_records = count;
    *max_len = maxl;
    return last_complete - buf;
}

// Second pass: fill codes [n_records, row_len] (pre-filled by caller or not;
// we pad with INVALID), lengths, and title spans (offset+length into buf).
// Sequences longer than row_len are truncated.
int64_t stpu_fastq_fill(const char* buf, int64_t n, int64_t n_records, int64_t row_len,
                        uint8_t* codes, int32_t* lengths,
                        int64_t* title_off, int32_t* title_len) {
    const char* p = buf;
    const char* end = buf + n;
    for (int64_t r = 0; r < n_records; r++) {
        const char* h_end = find_nl(p, end);
        title_off[r] = (p + 1) - buf;
        title_len[r] = static_cast<int32_t>(h_end - (p + 1));
        const char* s = h_end + 1;
        const char* s_end = find_nl(s, end);
        int64_t slen = s_end - s;
        int64_t keep = slen < row_len ? slen : row_len;
        uint8_t* out = codes + r * row_len;
        for (int64_t i = 0; i < keep; i++) out[i] = LUT.v[static_cast<uint8_t>(s[i])];
        if (keep < row_len) memset(out + keep, INVALID, static_cast<size_t>(row_len - keep));
        lengths[r] = static_cast<int32_t>(slen);
        const char* plus_end = find_nl(s_end + 1, end);
        const char* q_end = find_nl(plus_end + 1, end);
        p = (q_end == end) ? end : q_end + 1;
    }
    return 0;
}

// FASTA: count records and total/max sequence lengths (whitespace excluded).
// Chunks must start at '>' (or contain zero records).
int64_t stpu_fasta_scan(const char* buf, int64_t n, int64_t* n_records, int64_t* max_len) {
    const char* p = buf;
    const char* end = buf + n;
    int64_t count = 0, maxl = 0, cur = 0;
    bool in_seq = false;
    while (p < end) {
        const char* line_end = find_nl(p, end);
        if (p < line_end && *p == '>') {
            if (in_seq && cur > maxl) maxl = cur;
            cur = 0;
            count++;
            in_seq = true;
        } else {
            cur += line_end - p;
            // trailing \r
            if (line_end > p && line_end[-1] == '\r') cur--;
        }
        p = line_end + 1;
    }
    if (in_seq && cur > maxl) maxl = cur;
    *n_records = count;
    *max_len = maxl;
    return n;
}

// FASTA fill: encode each record's sequence into rows of codes.
int64_t stpu_fasta_fill(const char* buf, int64_t n, int64_t n_records, int64_t row_len,
                        uint8_t* codes, int32_t* lengths,
                        int64_t* title_off, int32_t* title_len) {
    const char* p = buf;
    const char* end = buf + n;
    int64_t r = -1;
    int64_t written = 0;
    uint8_t* out = nullptr;
    while (p < end) {
        const char* line_end = find_nl(p, end);
        int64_t llen = line_end - p;
        if (llen > 0 && line_end[-1] == '\r') llen--;
        if (llen > 0 && *p == '>') {
            if (r >= 0) {
                lengths[r] = static_cast<int32_t>(written);
                int64_t w = written < row_len ? written : row_len;
                if (w < row_len)
                    memset(out + w, INVALID, static_cast<size_t>(row_len - w));
            }
            r++;
            if (r >= n_records) return -1;
            title_off[r] = (p + 1) - buf;
            title_len[r] = static_cast<int32_t>(llen - 1);
            out = codes + r * row_len;
            written = 0;
        } else if (r >= 0) {
            int64_t keep = llen;
            if (written + keep > row_len) keep = row_len - written;
            for (int64_t i = 0; i < keep; i++)
                out[written + i] = LUT.v[static_cast<uint8_t>(p[i])];
            written += llen;  // true length keeps counting past row_len
        }
        p = line_end + 1;
    }
    if (r >= 0) {
        int64_t w = written < row_len ? written : row_len;
        lengths[r] = static_cast<int32_t>(written);
        if (w < row_len) memset(out + w, INVALID, static_cast<size_t>(row_len - w));
    }
    return 0;
}

}  // extern "C"
