/* hash10x_ref.c — C reference implementation of the hash10x_tpu hashing contract.
 *
 * Written from this framework's documented spec (hash10x_tpu/hashspec.py,
 * oracle/seqhash_ref.py) — NOT copied from richarddurbin/hash10x (whose source was
 * unavailable; SURVEY.md §0).  Purpose:
 *   1. the single-thread C baseline ("x1.0 row") for bench.py's vs_baseline,
 *      standing in for the reference binary per BASELINE.md;
 *   2. a differential oracle: --dump emits the sorted (hash,count) table for
 *      bit-exact comparison with the device pipeline.
 *
 * Usage: hash10x_ref <reads.bin> <k> <w> <seed> <tableBits> [--dump out.bin]
 *   reads.bin: u32 n, u32 L, then n*L uint8 base codes (0..3).
 * Prints one line: "reads <n> kmers <distinct> emitted <total> seconds <s>".
 * Counting is occurrence-mode minimizer counts (bench config #1 semantics).
 */

#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>
#include <time.h>

typedef uint64_t U64;
typedef uint32_t U32;
typedef uint8_t U8;

static U64 factor1, mask, patternRC[4];
static int shift1, K, W;

static void spec_init(int k, int w, unsigned seed) {
  srandom(seed);
  U64 r1 = (U64)random(), r2 = (U64)random();
  factor1 = (r1 << 32) | r2 | 1u;
  shift1 = 64 - 2 * k;
  mask = (((U64)1) << (2 * k)) - 1;
  for (int i = 0; i < 4; i++) patternRC[i] = ((U64)(3 - i)) << (2 * (k - 1));
  K = k; W = w;
}

static inline U64 hashF(U64 x) { return (x * factor1) >> shift1; }

/* open-addressing count table, linear probe, keys=hash (U64MAX empty) */
static U64 *tkeys; static U32 *tcounts; static U64 tmask; static U64 tfilled;

static void table_init(int bits) {
  U64 s = ((U64)1) << bits;
  tkeys = malloc(s * sizeof(U64));
  tcounts = calloc(s, sizeof(U32));
  memset(tkeys, 0xff, s * sizeof(U64));
  tmask = s - 1;
  tfilled = 0;
}

static inline void table_add(U64 h) {
  U64 s = h & tmask;
  for (;;) {
    if (tkeys[s] == h) { tcounts[s]++; return; }
    if (tkeys[s] == ~(U64)0) { tkeys[s] = h; tcounts[s] = 1; tfilled++; return; }
    s = (s + 1) & tmask;
  }
}

int main(int argc, char **argv) {
  if (argc < 6) { fprintf(stderr, "usage: %s reads.bin k w seed bits [--dump f]\n", argv[0]); return 2; }
  FILE *f = fopen(argv[1], "rb");
  if (!f) { perror("reads"); return 1; }
  U32 n, L;
  if (fread(&n, 4, 1, f) != 1 || fread(&L, 4, 1, f) != 1) return 1;
  U8 *reads = malloc((size_t)n * L);
  if (fread(reads, 1, (size_t)n * L, f) != (size_t)n * L) return 1;
  fclose(f);

  int k = atoi(argv[2]), w = atoi(argv[3]), bits = atoi(argv[5]);
  spec_init(k, w, (unsigned)atol(argv[4]));
  table_init(bits);

  int P = (int)L - k + 1;
  U64 *hv = malloc(P * sizeof(U64));
  U8 *emit = malloc(P);
  U64 emitted = 0;

  struct timespec t0, t1;
  clock_gettime(CLOCK_MONOTONIC, &t0);
  for (U32 r = 0; r < n; r++) {
    const U8 *s = reads + (size_t)r * L;
    U64 h = 0, hrc = 0;
    /* rolling canonical hashes of every k-mer (hashspec.py contract) */
    for (int i = 0; i < (int)L; i++) {
      U64 b = s[i];
      h = ((h << 2) | b) & mask;
      hrc = (hrc >> 2) | patternRC[b];
      if (i >= k - 1) {
        U64 hf = hashF(h), hr = hashF(hrc);
        hv[i - k + 1] = hf < hr ? hf : hr;
      }
    }
    /* leftmost-minimum w-window minimizer set (seqhash_ref.minimizers) */
    memset(emit, 0, P);
    int ww = w < P ? w : P;
    for (int st = 0; st + ww <= P; st++) {
      int best = st;
      for (int j = st + 1; j < st + ww; j++)
        if (hv[j] < hv[best]) best = j;
      emit[best] = 1;
    }
    for (int i = 0; i < P; i++)
      if (emit[i]) { table_add(hv[i]); emitted++; }
  }
  clock_gettime(CLOCK_MONOTONIC, &t1);
  double secs = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
  printf("reads %u kmers %llu emitted %llu seconds %.6f\n",
         n, (unsigned long long)tfilled, (unsigned long long)emitted, secs);

  if (argc >= 8 && !strcmp(argv[6], "--dump")) {
    /* sorted (hash,count) pairs for differential comparison */
    U64 sz = tmask + 1, m = 0;
    U64 *hs = malloc(tfilled * sizeof(U64));
    U32 *cs = malloc(tfilled * sizeof(U32));
    for (U64 i = 0; i < sz; i++)
      if (tkeys[i] != ~(U64)0) { hs[m] = tkeys[i]; cs[m] = tcounts[i]; m++; }
    /* insertion sort is too slow; simple qsort on index pairs */
    U64 *idx = malloc(m * sizeof(U64));
    for (U64 i = 0; i < m; i++) idx[i] = i;
    int cmp(const void *a, const void *b) {
      U64 x = hs[*(const U64 *)a], y = hs[*(const U64 *)b];
      return x < y ? -1 : x > y ? 1 : 0;
    }
    qsort(idx, m, sizeof(U64), cmp);
    FILE *o = fopen(argv[7], "wb");
    fwrite(&m, 8, 1, o);
    for (U64 i = 0; i < m; i++) fwrite(&hs[idx[i]], 8, 1, o);
    for (U64 i = 0; i < m; i++) fwrite(&cs[idx[i]], 4, 1, o);
    fclose(o);
  }
  return 0;
}
