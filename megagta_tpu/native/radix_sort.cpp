// Native multi-word LSD radix sort (argsort) for packed k-mer keys.
//
// TPU-native counterpart of the reference's host sorting engine
// (src/lv2_cpu_sort.h:113-150 radix passes; src/kthread.cpp work pool):
// sorts [n, words] row-major uint64 keys by 16-bit digits from the least
// significant word upward and emits the permutation, parallelized over
// pthreads with per-thread digit histograms merged by prefix sums.
// Used by graph/builder.py for the BOSS row sort when available.

#include <cstdint>
#include <cstring>
#include <pthread.h>
#include <vector>

namespace {

struct DigitPassArgs {
    const uint64_t *keys;  // [n, words]
    const uint32_t *in_perm;
    uint32_t *out_perm;
    int64_t n;
    int words;
    int word;      // which word this pass examines
    int shift;     // bit shift of the 16-bit digit
    int64_t *hist;  // [n_threads, 65536]
    int n_threads;
};

struct ThreadSlot {
    DigitPassArgs *args;
    int tid;
};

void *count_thread(void *p) {
    auto *slot = (ThreadSlot *)p;
    auto *a = slot->args;
    int64_t chunk = (a->n + a->n_threads - 1) / a->n_threads;
    int64_t lo = slot->tid * chunk;
    int64_t hi = lo + chunk < a->n ? lo + chunk : a->n;
    int64_t *h = a->hist + (int64_t)slot->tid * 65536;
    memset(h, 0, 65536 * sizeof(int64_t));
    for (int64_t i = lo; i < hi; ++i) {
        uint32_t row = a->in_perm[i];
        uint16_t d = (uint16_t)(a->keys[(int64_t)row * a->words + a->word] >> a->shift);
        ++h[d];
    }
    return nullptr;
}

void *scatter_thread(void *p) {
    auto *slot = (ThreadSlot *)p;
    auto *a = slot->args;
    int64_t chunk = (a->n + a->n_threads - 1) / a->n_threads;
    int64_t lo = slot->tid * chunk;
    int64_t hi = lo + chunk < a->n ? lo + chunk : a->n;
    int64_t *h = a->hist + (int64_t)slot->tid * 65536;
    for (int64_t i = lo; i < hi; ++i) {
        uint32_t row = a->in_perm[i];
        uint16_t d = (uint16_t)(a->keys[(int64_t)row * a->words + a->word] >> a->shift);
        a->out_perm[h[d]++] = row;
    }
    return nullptr;
}

}  // namespace

extern "C" {

// argsort of [n, words] uint64 rows (lexicographic, word 0 most
// significant). perm_out must hold n uint32 entries. Returns 0 on success.
int radix_argsort_u64(const uint64_t *keys, int64_t n, int words,
                      uint32_t *perm_out, int n_threads) {
    if (n <= 0) return 0;
    if (n > INT64_C(4294967295)) return 1;
    if (n_threads < 1) n_threads = 1;

    std::vector<uint32_t> perm_a(n), perm_b(n);
    for (int64_t i = 0; i < n; ++i) perm_a[i] = (uint32_t)i;

    std::vector<int64_t> hist((int64_t)n_threads * 65536);
    std::vector<pthread_t> threads(n_threads);
    std::vector<ThreadSlot> slots(n_threads);

    uint32_t *in = perm_a.data();
    uint32_t *out = perm_b.data();

    DigitPassArgs args;
    args.keys = keys;
    args.n = n;
    args.words = words;
    args.hist = hist.data();
    args.n_threads = n_threads;

    for (int w = words - 1; w >= 0; --w) {
        for (int shift = 0; shift < 64; shift += 16) {
            args.word = w;
            args.shift = shift;
            args.in_perm = in;
            args.out_perm = out;
            for (int t = 0; t < n_threads; ++t) {
                slots[t] = {&args, t};
                pthread_create(&threads[t], nullptr, count_thread, &slots[t]);
            }
            for (int t = 0; t < n_threads; ++t) pthread_join(threads[t], nullptr);
            // exclusive prefix sum across digits, thread-major within digit
            int64_t acc = 0;
            for (int d = 0; d < 65536; ++d) {
                for (int t = 0; t < n_threads; ++t) {
                    int64_t c = hist[(int64_t)t * 65536 + d];
                    hist[(int64_t)t * 65536 + d] = acc;
                    acc += c;
                }
            }
            for (int t = 0; t < n_threads; ++t) {
                slots[t] = {&args, t};
                pthread_create(&threads[t], nullptr, scatter_thread, &slots[t]);
            }
            for (int t = 0; t < n_threads; ++t) pthread_join(threads[t], nullptr);
            uint32_t *tmp = in;
            in = out;
            out = tmp;
        }
    }
    memcpy(perm_out, in, (size_t)n * sizeof(uint32_t));
    return 0;
}
}
