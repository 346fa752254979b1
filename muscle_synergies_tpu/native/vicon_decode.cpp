// Fast numeric-block decoder for Vicon Nexus CSV exports.
//
// The ingest hot path is turning ~130k lines x ~130 columns of ASCII
// floats into a dense float64 matrix (the reference burns this time in
// a per-cell Python loop, reader.py:927-955; our Python fallback uses
// pandas' C reader).  This decoder is a single zero-copy pass over the
// file buffer: cells split on ',', rows on '\n', empty cells -> NaN,
// columns beyond num_cols ignored, short rows padded with NaN.
//
// Built as a plain shared library (no Python.h); bound via ctypes.

#include <algorithm>
#include <charconv>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// A cell character that constitutes content.  Lines whose cells are
// all empty (only separators/whitespace) are "blank" and skipped by
// both the row counter and the decoder — the two MUST agree or the
// threaded decode writes rows at wrong offsets.
static inline bool is_content(char c) {
    return c != ',' && c != ' ' && c != '\t' && c != '\r';
}

// Exact fast path for plain fixed-point cells ("1", "-0.00220871",
// "100.5" — the overwhelming majority of a Vicon export).  Safe by
// Gay's small-decimal rule: when the mantissa fits in 53 bits and the
// fractional digit count stays within the exactly-representable
// powers of ten, double(mant) / double(10^frac) performs ONE rounding
// and therefore equals the correctly-rounded decimal value —
// bit-identical to std::from_chars.  Anything else (exponents, long
// mantissas) returns false and takes the from_chars path.
static inline bool fast_parse(const char* p, const char* end, double* out) {
    static const double p10[] = {
        1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7, 1e8, 1e9,
        1e10, 1e11, 1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18,
    };
    bool neg = false;
    if (p < end && *p == '-') { neg = true; ++p; }
    unsigned long long mant = 0;
    int digits = 0, frac = 0;
    bool seen_dot = false;
    for (; p < end; ++p) {
        char c = *p;
        if (c >= '0' && c <= '9') {
            if (++digits > 18) return false;
            mant = mant * 10ULL + (unsigned long long)(c - '0');
            if (seen_dot) ++frac;
        } else if (c == '.' && !seen_dot) {
            seen_dot = true;
        } else {
            return false;  // exponent / junk: slow path decides
        }
    }
    if (digits == 0) return false;  // "." / "-": slow path rejects
    if (mant >> 53) return false;   // not exactly representable
    double v = (double)mant;
    if (frac) v /= p10[frac];
    *out = neg ? -v : v;
    return true;
}

// Count data rows (non-blank lines) in the buffer.
long msk_count_rows(const char* buf, long len) {
    long rows = 0;
    bool has_content = false;
    for (long i = 0; i < len; ++i) {
        char c = buf[i];
        if (c == '\n') {
            if (has_content) ++rows;
            has_content = false;
        } else if (is_content(c)) {
            has_content = true;
        }
    }
    if (has_content) ++rows;
    return rows;
}

// Decode the numeric block.
//
// Returns 0 on success, or the 1-based row number of the first cell
// that failed to parse as a float (for error reporting).
//
//   buf, len:   raw bytes of the data block (ASCII)
//   num_cols:   columns to keep per row (extra columns are ignored)
//   out:        preallocated [max_rows * num_cols] float64 array
//   max_rows:   capacity of `out`
//   out_rows:   receives the number of decoded rows
static long decode_range(const char* buf, long len, long num_cols,
                         double* out, long max_rows, long* out_rows,
                         long row_base) {
    const double nan_val = std::nan("");
    long row = 0;
    long i = 0;
    while (i < len && row < max_rows) {
        // find end of line
        long line_start = i;
        long line_end = i;
        while (line_end < len && buf[line_end] != '\n') ++line_end;
        long content_end = line_end;
        while (content_end > line_start && buf[content_end - 1] == '\r')
            --content_end;

        // skip blank lines (cells all empty); must match msk_count_rows
        bool blank = true;
        for (long j = line_start; j < content_end; ++j) {
            if (is_content(buf[j])) { blank = false; break; }
        }
        if (blank) { i = line_end + 1; continue; }

        double* out_row = out + row * num_cols;
        long col = 0;
        long cell_start = line_start;
        for (long j = line_start; j <= content_end && col < num_cols; ++j) {
            if (j == content_end || buf[j] == ',') {
                if (j == cell_start) {
                    out_row[col] = nan_val;  // empty cell
                } else {
                    const char* cs = buf + cell_start;
                    const char* ce = buf + j;
                    while (cs < ce && (*cs == ' ' || *cs == '\t')) ++cs;
                    while (ce > cs && (ce[-1] == ' ' || ce[-1] == '\t')) --ce;
                    double v;
                    // from_chars rejects a leading '+'; Vicon never
                    // emits one, but accept it for robustness.
                    if (cs < ce && *cs == '+') ++cs;
                    if (fast_parse(cs, ce, &v)) {
                        out_row[col] = v;
                        ++col;
                        cell_start = j + 1;
                        continue;
                    }
                    auto res = std::from_chars(cs, ce, v);
                    if (res.ec != std::errc() || res.ptr != ce) {
                        if (cs == ce) { out_row[col] = nan_val; ++col;
                                        cell_start = j + 1; continue; }
                        return row_base + row + 1;  // parse error
                    }
                    out_row[col] = v;
                }
                ++col;
                cell_start = j + 1;
            }
        }
        // short row: pad with NaN
        for (; col < num_cols; ++col) out_row[col] = nan_val;
        ++row;
        i = line_end + 1;
    }
    *out_rows = row;
    return 0;
}

// Decode the numeric block (parallel over row ranges).
//
// Same contract as decode_range with row_base = 0: returns 0 on
// success or the 1-based row number of the first unparseable cell.
long msk_decode_block(const char* buf, long len, long num_cols,
                      double* out, long max_rows, long* out_rows) {
    unsigned hw = std::thread::hardware_concurrency();
    long n_threads = std::min<long>(hw ? hw : 1, 16);
    if (len < (1 << 20) || n_threads <= 1) {
        return decode_range(buf, len, num_cols, out, max_rows, out_rows, 0);
    }

    // split at line boundaries
    std::vector<long> starts{0};
    for (long t = 1; t < n_threads; ++t) {
        long pos = len * t / n_threads;
        while (pos < len && buf[pos - 1] != '\n') ++pos;
        starts.push_back(pos);
    }
    starts.push_back(len);

    // rows before each chunk (so each thread writes at its offset)
    std::vector<long> row_offset(n_threads + 1, 0);
    for (long t = 0; t < n_threads; ++t) {
        row_offset[t + 1] = row_offset[t] +
            msk_count_rows(buf + starts[t], starts[t + 1] - starts[t]);
    }

    std::vector<long> status(n_threads, 0), got(n_threads, 0);
    std::vector<std::thread> workers;
    for (long t = 0; t < n_threads; ++t) {
        workers.emplace_back([&, t]() {
            long rows_cap = std::min(max_rows - row_offset[t],
                                     row_offset[t + 1] - row_offset[t]);
            if (rows_cap < 0) rows_cap = 0;
            status[t] = decode_range(
                buf + starts[t], starts[t + 1] - starts[t], num_cols,
                out + row_offset[t] * num_cols, rows_cap, &got[t],
                row_offset[t]);
        });
    }
    for (auto& w : workers) w.join();

    long total = 0;
    for (long t = 0; t < n_threads; ++t) total += got[t];
    *out_rows = total;
    for (long t = 0; t < n_threads; ++t) {
        if (status[t] != 0) return status[t];
    }
    return 0;
}

}  // extern "C"
