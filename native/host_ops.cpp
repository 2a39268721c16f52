// Native host-side runtime ops for repeatresolver_tpu.
//
// The reference implements its whole runtime in C (pthreads + popcount
// loops). Our compute path is JAX/XLA on TPU; these are the remaining
// host-side hot loops whose semantics are inherently sequential /
// order-dependent and therefore stay on the CPU:
//
//  * the Kmeans top-5 "slot machine" + assignment/dissolution loops of
//    RepeatResolver.c:2656-2755 (literal order-dependent simulation;
//    O(n^2) per cluster — too slow in Python at production scale)
//  * per-row edit-script backtracking over DP move codes
//    (InitialAligner.c:359-383 semantics)
//
// Built by native/build.sh into libhostops.so; loaded via ctypes
// (repeatresolver_tpu/utils/native.py) with a pure-Python fallback.
#include <cstdint>
#include <cstring>

extern "C" {

// Top-5 slot machine + centroid construction (RepeatResolver.c:2656-2703).
// scores: [n, n] row-major GrMatch scores (symmetric).
// varsigs: [n, v] 0/1 membership over selected vars.
// centroids out: [n, v] 0/1 (majority >2 of the 5 picks).
void kmeans_top5_centroids(const int64_t* scores, const uint8_t* varsigs,
                           int64_t n, int64_t v, uint8_t* centroids)
{
    for (int64_t i = 0; i < n; i++) {
        int64_t bs[5] = {0, 0, 0, 0, 0};
        int64_t bj[5] = {0, 0, 0, 0, 0};
        const int64_t* row = scores + i * n;
        for (int64_t j = 0; j < n; j++) {
            // ascending selection pass (strict-less swaps)
            for (int k = 0; k < 5; k++) {
                for (int l = k + 1; l < 5; l++) {
                    if (bs[l] < bs[k]) {
                        int64_t t = bs[l]; bs[l] = bs[k]; bs[k] = t;
                        t = bj[l]; bj[l] = bj[k]; bj[k] = t;
                    }
                }
            }
            if (row[j] > bs[0]) { bs[0] = row[j]; bj[0] = j; }
        }
        uint8_t* cent = centroids + i * v;
        for (int64_t jv = 0; jv < v; jv++) {
            int s = 0;
            for (int k = 0; k < 5; k++)
                s += varsigs[bj[k] * v + jv];
            cent[jv] = (s > 2) ? 1 : 0;
        }
    }
}

// Assignment + dissolution (RepeatResolver.c:2706-2755).
// cent_scores: [n, n] row-major; cent_scores[j*n + i] = GrMatch of
// centroid j vs varsig i (matches the reference's loop order).
void kmeans_assign_dissolve(const int64_t* cent_scores, int64_t n,
                            int64_t mingroup, int32_t* clusternumber,
                            int64_t* clustersize)
{
    for (int64_t j = 0; j < n; j++) clustersize[j] = 0;
    for (int64_t i = 0; i < n; i++) {
        int64_t best_s = 0, best_j = 0;
        for (int64_t j = 0; j < n; j++) {
            int64_t sc = cent_scores[j * n + i];
            if (sc > best_s && i != j) { best_s = sc; best_j = j; }
        }
        clusternumber[i] = (int32_t)best_j;
        clustersize[best_j]++;
    }
    for (int64_t mn = 2; mn < mingroup; mn++) {
        for (int64_t i = 0; i < n; i++) {
            if (clustersize[clusternumber[i]] <= mn) {
                int64_t best_s = 0, best_j = 0;
                for (int64_t j = 0; j < n; j++) {
                    if (clustersize[j] >= mn && clusternumber[i] != j) {
                        int64_t sc = cent_scores[j * n + i];
                        if (sc > best_s && i != j) {
                            best_s = sc; best_j = j;
                        }
                    }
                }
                clustersize[clusternumber[i]]--;
                clusternumber[i] = (int32_t)best_j;
                clustersize[best_j]++;
            }
        }
    }
}

// Edit-script backtracking over DP move codes for a batch of rows
// (InitialAligner.c semantics: codes 0/3 diagonal, 1 consume target,
// 2 consume query). alignments out: [b, lq] target col per query base
// or -1. codes: [b, lq, lt] row-major.
void editdp_backtrack(const int8_t* codes, const int32_t* qlens,
                      const int64_t* entries, int64_t b, int64_t lq,
                      int64_t lt, int32_t* alignments)
{
    for (int64_t r = 0; r < b; r++) {
        const int8_t* cr = codes + r * lq * lt;
        int32_t* out = alignments + r * lq;
        for (int64_t i = 0; i < lq; i++) out[i] = -1;
        int64_t x = (int64_t)qlens[r] - 1;
        int64_t y = entries[r];
        while (x > -1 && y > -1) {
            int8_t code = cr[x * lt + y];
            if (code == 0 || code == 3) {      // diagonal
                out[x] = (int32_t)y;
                x--; y--;
            } else if (code == 1) {            // consume target
                y--;
            } else {                           // consume query
                x--;
            }
        }
    }
}

// Realignment backtracking over banded move codes for one row
// (PW_ReAligner Backtracker semantics; see ops/banded_realign.py).
// codes: [l, w]; anf derived from ways. Returns number of inserts.
// out_row: [c] preset to 5 by the caller. ins_y/ins_base: capacity k.
int64_t realign_backtrack(const uint8_t* codes, const int32_t* ways,
                          int64_t l, int64_t w, int64_t c, int64_t bh,
                          const int8_t* seq, int64_t wayin,
                          int8_t* out_row, int32_t* ins_y,
                          int8_t* ins_base, int64_t cap)
{
    int64_t x = l - 1, y = wayin, n = 0;
    while (x > -1 && y > -1) {
        int64_t anf = ways[x] - bh;
        if (anf < 0) anf = 0;
        int64_t top = anf + w - 1;
        int is_last = (x == l - 1);
        if (y > top) {
            if (!is_last) out_row[y] = 4;
            y--;
            continue;
        }
        uint8_t code = codes[x * w + (y - anf)];
        if (code == 0) {
            if (!is_last) out_row[y] = 4;
            y--;
        } else if (code == 1) {
            out_row[y] = seq[x];
            x--; y--;
        } else {
            if (n < cap) { ins_y[n] = (int32_t)y; ins_base[n] = seq[x]; }
            n++;
            x--;
        }
    }
    return n;
}

}  // extern "C"
