// Exact nearest-neighbor search — the native stand-in for FAISS IndexFlatIP /
// IndexFlatL2 (the reference's only native retrieval dependency,
// AnyLoc utilities.py:439-450). Blocked score computation + bounded per-query
// heap, C ABI for ctypes.
//
// Conventions match FAISS: metric 0 = inner product (descending scores),
// metric 1 = squared L2 (ascending distances).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct HeapEntryMax {  // min-heap on score => keeps top-k largest
    float score;
    int64_t idx;
    bool operator<(const HeapEntryMax& o) const { return score > o.score; }
};

// Blocked dot products: qu [nq, d] x db[block] -> scores.
// Block sizes sized for L2-resident tiles.
constexpr int kQBlock = 64;
constexpr int kDbBlock = 256;

// One worker's share: query blocks [q0, q1). Each query is independent, so
// the parallel split is over query blocks with all scratch thread-local and
// results written to disjoint output rows — deterministic by construction.
void nn_search_range(const float* db, int64_t n_db, int64_t d, const float* qu,
                     int64_t k, int metric, const float* db_norms,
                     int64_t q_begin, int64_t q_end, float* out_scores,
                     int64_t* out_idx) {
    std::vector<std::vector<HeapEntryMax>> heaps(kQBlock);
    std::vector<float> block_scores(kQBlock * kDbBlock);

    for (int64_t q0 = q_begin; q0 < q_end; q0 += kQBlock) {
        const int64_t qb = std::min<int64_t>(kQBlock, q_end - q0);
        for (int64_t qi = 0; qi < qb; ++qi) heaps[qi].clear();

        std::vector<float> qu_norms(qb, 0.f);
        if (metric == 1) {
            for (int64_t qi = 0; qi < qb; ++qi) {
                const float* row = qu + (q0 + qi) * d;
                float s = 0.f;
                for (int64_t j = 0; j < d; ++j) s += row[j] * row[j];
                qu_norms[qi] = s;
            }
        }

        for (int64_t b0 = 0; b0 < n_db; b0 += kDbBlock) {
            const int64_t bb = std::min<int64_t>(kDbBlock, n_db - b0);
            // score tile
            for (int64_t qi = 0; qi < qb; ++qi) {
                const float* qrow = qu + (q0 + qi) * d;
                float* srow = block_scores.data() + qi * kDbBlock;
                for (int64_t bi = 0; bi < bb; ++bi) {
                    const float* drow = db + (b0 + bi) * d;
                    float dot = 0.f;
                    for (int64_t j = 0; j < d; ++j) dot += qrow[j] * drow[j];
                    srow[bi] = dot;
                }
            }
            // heap update (larger-is-better internally; L2 negated)
            for (int64_t qi = 0; qi < qb; ++qi) {
                auto& heap = heaps[qi];
                const float* srow = block_scores.data() + qi * kDbBlock;
                for (int64_t bi = 0; bi < bb; ++bi) {
                    float s = (metric == 0)
                                  ? srow[bi]
                                  : -(qu_norms[qi] - 2.f * srow[bi] +
                                      db_norms[b0 + bi]);
                    if ((int64_t)heap.size() < k) {
                        heap.push_back({s, b0 + bi});
                        std::push_heap(heap.begin(), heap.end());
                    } else if (s > heap.front().score) {
                        std::pop_heap(heap.begin(), heap.end());
                        heap.back() = {s, b0 + bi};
                        std::push_heap(heap.begin(), heap.end());
                    }
                }
            }
        }
        // emit sorted (best first), FAISS tie-break by index
        for (int64_t qi = 0; qi < qb; ++qi) {
            auto& heap = heaps[qi];
            std::sort(heap.begin(), heap.end(), [](const HeapEntryMax& a,
                                                   const HeapEntryMax& b) {
                if (a.score != b.score) return a.score > b.score;
                return a.idx < b.idx;
            });
            for (int64_t r = 0; r < k; ++r) {
                const float s = heap[r].score;
                out_scores[(q0 + qi) * k + r] = (metric == 0) ? s : -s;
                out_idx[(q0 + qi) * k + r] = heap[r].idx;
            }
        }
    }
}

}  // namespace

extern "C" {

// db: [n_db, d] row-major float32; qu: [n_qu, d]; out_scores/out_idx: [n_qu, k]
// metric: 0 = IP (top-k largest), 1 = squared L2 (top-k smallest).
// n_threads <= 0 selects hardware concurrency. Queries split across threads
// in contiguous kQBlock-aligned ranges; output is thread-count-invariant.
void nn_search_mt(const float* db, int64_t n_db, int64_t d, const float* qu,
                  int64_t n_qu, int64_t k, int metric, float* out_scores,
                  int64_t* out_idx, int n_threads) {
    if (k > n_db) k = n_db;
    std::vector<float> db_norms;
    if (metric == 1) {
        db_norms.resize(n_db);
        for (int64_t i = 0; i < n_db; ++i) {
            const float* row = db + i * d;
            float s = 0.f;
            for (int64_t j = 0; j < d; ++j) s += row[j] * row[j];
            db_norms[i] = s;
        }
    }
    if (n_threads <= 0) {
        n_threads = (int)std::thread::hardware_concurrency();
        if (n_threads <= 0) n_threads = 1;
    }
    const int64_t n_blocks = (n_qu + kQBlock - 1) / kQBlock;
    if (n_threads > n_blocks) n_threads = (int)n_blocks;

    if (n_threads <= 1) {
        nn_search_range(db, n_db, d, qu, k, metric, db_norms.data(), 0, n_qu,
                        out_scores, out_idx);
        return;
    }
    std::vector<std::thread> workers;
    const int64_t blocks_per = (n_blocks + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        const int64_t q_begin = t * blocks_per * kQBlock;
        const int64_t q_end = std::min<int64_t>(n_qu, q_begin + blocks_per * kQBlock);
        if (q_begin >= q_end) break;
        workers.emplace_back(nn_search_range, db, n_db, d, qu, k, metric,
                             db_norms.data(), q_begin, q_end, out_scores,
                             out_idx);
    }
    for (auto& w : workers) w.join();
}

void nn_search(const float* db, int64_t n_db, int64_t d, const float* qu,
               int64_t n_qu, int64_t k, int metric, float* out_scores,
               int64_t* out_idx) {
    nn_search_mt(db, n_db, d, qu, n_qu, k, metric, out_scores, out_idx, 0);
}

// Recall@K accumulation over variable-length ground-truth positive lists
// (CSR layout: gt_indptr [n_qu+1], gt_data). Mirrors utilities.py:451-465.
void recall_at_k(const int64_t* retrieved, int64_t n_qu, int64_t max_k,
                 const int64_t* gt_indptr, const int64_t* gt_data,
                 const int64_t* ks, int64_t n_ks, int64_t sub_sample_db,
                 int64_t sub_sample_qu, int64_t* hits_out) {
    std::memset(hits_out, 0, sizeof(int64_t) * n_ks);
    for (int64_t q = 0; q < n_qu; ++q) {
        const int64_t g0 = gt_indptr[q * sub_sample_qu];
        const int64_t g1 = gt_indptr[q * sub_sample_qu + 1];
        int64_t first_hit = -1;
        for (int64_t r = 0; r < max_k; ++r) {
            const int64_t item = retrieved[q * max_k + r] * sub_sample_db;
            for (int64_t g = g0; g < g1; ++g) {
                if (gt_data[g] == item) {
                    first_hit = r;
                    break;
                }
            }
            if (first_hit >= 0) break;
        }
        if (first_hit >= 0) {
            for (int64_t i = 0; i < n_ks; ++i) {
                if (first_hit < ks[i]) ++hits_out[i];
            }
        }
    }
}

// IVF probed search — the host counterpart of FAISS IndexIVFFlat (and of
// the device engine in anyloc_tpu/ops/ivf.py). The inverted file is a CSR
// posting list (cell_indptr [n_cells+1], cell_rows: db row ids ordered by
// cell); for each query the top n_probe cells by centroid score are scanned
// exactly with the same bounded heap as nn_search. Queries split across
// threads; output is thread-count-invariant.
void ivf_search_mt(const float* db, int64_t n_db, int64_t d,
                   const float* cells, int64_t n_cells,
                   const int64_t* cell_indptr, const int64_t* cell_rows,
                   const float* qu, int64_t n_qu, int64_t k, int64_t n_probe,
                   int metric, float* out_scores, int64_t* out_idx,
                   int n_threads) {
    if (n_probe > n_cells) n_probe = n_cells;
    std::vector<float> cell_norms, db_norms;
    if (metric == 1) {
        cell_norms.resize(n_cells);
        for (int64_t c = 0; c < n_cells; ++c) {
            const float* row = cells + c * d;
            float s = 0.f;
            for (int64_t j = 0; j < d; ++j) s += row[j] * row[j];
            cell_norms[c] = s;
        }
        db_norms.resize(n_db);
        for (int64_t i = 0; i < n_db; ++i) {
            const float* row = db + i * d;
            float s = 0.f;
            for (int64_t j = 0; j < d; ++j) s += row[j] * row[j];
            db_norms[i] = s;
        }
    }
    auto worker = [&](int64_t q_begin, int64_t q_end) {
        std::vector<HeapEntryMax> cell_heap;
        std::vector<HeapEntryMax> heap;
        for (int64_t q = q_begin; q < q_end; ++q) {
            const float* qrow = qu + q * d;
            // 1) score centroids, keep top n_probe (bounded heap)
            cell_heap.clear();
            for (int64_t c = 0; c < n_cells; ++c) {
                const float* crow = cells + c * d;
                float dot = 0.f;
                for (int64_t j = 0; j < d; ++j) dot += qrow[j] * crow[j];
                const float s = (metric == 0) ? dot
                                              : (2.f * dot - cell_norms[c]);
                if ((int64_t)cell_heap.size() < n_probe) {
                    cell_heap.push_back({s, c});
                    std::push_heap(cell_heap.begin(), cell_heap.end());
                } else if (s > cell_heap.front().score) {
                    std::pop_heap(cell_heap.begin(), cell_heap.end());
                    cell_heap.back() = {s, c};
                    std::push_heap(cell_heap.begin(), cell_heap.end());
                }
            }
            // 2) exact scan of the probed cells' posting lists
            heap.clear();
            for (const auto& ce : cell_heap) {
                const int64_t c = ce.idx;
                for (int64_t p = cell_indptr[c]; p < cell_indptr[c + 1]; ++p) {
                    const int64_t i = cell_rows[p];
                    const float* row = db + i * d;
                    float dot = 0.f;
                    for (int64_t j = 0; j < d; ++j) dot += qrow[j] * row[j];
                    const float s = (metric == 0) ? dot
                                                  : (2.f * dot - db_norms[i]);
                    if ((int64_t)heap.size() < k) {
                        heap.push_back({s, i});
                        std::push_heap(heap.begin(), heap.end());
                    } else if (s > heap.front().score) {
                        std::pop_heap(heap.begin(), heap.end());
                        heap.back() = {s, i};
                        std::push_heap(heap.begin(), heap.end());
                    }
                }
            }
            std::sort(heap.begin(), heap.end(),
                      [](const HeapEntryMax& a, const HeapEntryMax& b) {
                          if (a.score != b.score) return a.score > b.score;
                          return a.idx < b.idx;  // FAISS tie-break
                      });
            float qnorm = 0.f;
            if (metric == 1)
                for (int64_t j = 0; j < d; ++j) qnorm += qrow[j] * qrow[j];
            for (int64_t r = 0; r < k; ++r) {
                if (r < (int64_t)heap.size()) {
                    out_scores[q * k + r] =
                        (metric == 0) ? heap[r].score
                                      : (qnorm - heap[r].score);
                    out_idx[q * k + r] = heap[r].idx;
                } else {  // fewer candidates than k
                    out_scores[q * k + r] =
                        (metric == 0) ? -HUGE_VALF : HUGE_VALF;
                    out_idx[q * k + r] = -1;
                }
            }
        }
    };
    if (n_threads <= 0) {
        n_threads = (int)std::thread::hardware_concurrency();
        if (n_threads <= 0) n_threads = 1;
    }
    if (n_threads > n_qu) n_threads = (int)(n_qu > 0 ? n_qu : 1);
    if (n_threads <= 1) {
        worker(0, n_qu);
        return;
    }
    std::vector<std::thread> workers;
    const int64_t per = (n_qu + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; ++t) {
        const int64_t q0 = t * per, q1 = std::min<int64_t>(n_qu, q0 + per);
        if (q0 >= q1) break;
        workers.emplace_back(worker, q0, q1);
    }
    for (auto& w : workers) w.join();
}

}  // extern "C"
