// Native FASTA/FASTQ parser + 2-bit code packer.
//
// TPU-native replacement for the reference's C++ sequence ingestion layer
// (src/kseq.h + src/sequence_manager.cpp:109-213): parses plain or gzip'ed
// fastx into a flat code array (A=0 C=1 G=2 T=3) plus read-boundary
// offsets, applying the reference's trimN rule (keep the first N-free run,
// src/sequence_manager.cpp:87-107). Exposed via a C ABI consumed through
// ctypes (megagta_tpu/native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

struct ParseResult {
    std::vector<int8_t> codes;
    std::vector<int64_t> starts;
};

int8_t code_of[256];

struct CodeInit {
    CodeInit() {
        memset(code_of, -1, sizeof(code_of));
        code_of[(int)'A'] = code_of[(int)'a'] = 0;
        code_of[(int)'C'] = code_of[(int)'c'] = 1;
        code_of[(int)'G'] = code_of[(int)'g'] = 2;
        code_of[(int)'T'] = code_of[(int)'t'] = 3;
    }
} code_init;

class Reader {
  public:
    explicit Reader(const char *path) : gz_(gzopen(path, "rb")) {}
    ~Reader() {
        if (gz_) gzclose(gz_);
    }
    bool ok() const { return gz_ != nullptr; }
    // returns bytes read, 0 on EOF
    int read(char *buf, int n) { return gzread(gz_, buf, n); }

  private:
    gzFile gz_;
};

// append one sequence with trimN semantics
void append_seq(ParseResult &r, const char *s, int64_t len) {
    int64_t b = -1, e = len;
    for (int64_t i = 0; i < len; ++i) {
        bool is_n = code_of[(uint8_t)s[i]] < 0;
        if (b < 0) {
            if (!is_n) b = i;
        } else if (is_n) {
            e = i;
            break;
        }
    }
    if (b < 0) {
        b = 0;
        e = 0;
    }
    for (int64_t i = b; i < e; ++i) r.codes.push_back(code_of[(uint8_t)s[i]]);
    r.starts.push_back((int64_t)r.codes.size());
}

bool parse_stream(Reader &rd, ParseResult &out) {
    out.starts.push_back(0);
    std::string data;
    {
        char buf[1 << 20];
        int n;
        while ((n = rd.read(buf, sizeof(buf))) > 0) data.append(buf, n);
    }
    size_t i = 0, n = data.size();
    if (n == 0) return true;
    std::string seq;
    if (data[0] == '>') {
        while (i < n) {
            // header line
            while (i < n && data[i] != '\n') ++i;
            ++i;
            seq.clear();
            while (i < n && data[i] != '>') {
                size_t j = i;
                while (j < n && data[j] != '\n') ++j;
                seq.append(data, i, j - i);
                i = j + 1;
            }
            // strip CRs
            seq.erase(std::remove(seq.begin(), seq.end(), '\r'), seq.end());
            append_seq(out, seq.data(), (int64_t)seq.size());
        }
        return true;
    } else if (data[0] == '@') {
        while (i < n) {
            while (i < n && data[i] != '\n') ++i;  // @header
            ++i;
            size_t j = i;
            while (j < n && data[j] != '\n') ++j;  // sequence
            size_t slen = j - i;
            append_seq(out, data.data() + i, (int64_t)slen);
            i = j + 1;
            while (i < n && data[i] != '\n') ++i;  // +
            ++i;
            // quality line: same byte length as the sequence
            i += slen;
            while (i < n && data[i] != '\n') ++i;
            ++i;
        }
        return true;
    }
    return false;
}

ParseResult *g_last = nullptr;

}  // namespace

extern "C" {

// Parse `path`; returns 0 on success. Sizes are retrieved first, then the
// caller allocates and calls fastx_fetch to copy + free.
int fastx_parse(const char *path, int64_t *num_reads, int64_t *num_bases) {
    Reader rd(path);
    if (!rd.ok()) return 1;
    auto *res = new ParseResult();
    if (!parse_stream(rd, *res)) {
        delete res;
        return 2;
    }
    delete g_last;
    g_last = res;
    *num_reads = (int64_t)res->starts.size() - 1;
    *num_bases = (int64_t)res->codes.size();
    return 0;
}

int fastx_fetch(int8_t *codes_out, int64_t *starts_out) {
    if (!g_last) return 1;
    memcpy(codes_out, g_last->codes.data(), g_last->codes.size());
    memcpy(starts_out, g_last->starts.data(),
           g_last->starts.size() * sizeof(int64_t));
    delete g_last;
    g_last = nullptr;
    return 0;
}
}
