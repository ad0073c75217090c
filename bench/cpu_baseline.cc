// CPU baseline for the banded semi-global Smith-Waterman forward DP.
//
// Independent implementation of the same recurrence the reference's
// BandedSmithWaterman::find_alignment fills (match 5 / mismatch -4 /
// gap -8, N-vs-X 0, N-vs-N 5, band matrix x_size x (2*band+1), cell
// (i,j) reads diag (i-1,j), up (i-1,j+1), left (i,j-1)), storing the
// whole band matrix like the reference does.  Multi-threaded over
// independent problems to stand in for 8-thread gam-merge.
//
// Usage: cpu_baseline [nthreads] [reps]   -> prints "CELLS_PER_SEC <x>"

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <thread>
#include <vector>

static const int GAP = -8;

static inline int32_t base_score(uint8_t a, uint8_t b) {
  if (a == 4 || b == 4) return (a == 4 && b == 4) ? 5 : 0;
  return a == b ? 5 : -4;
}

int main(int argc, char** argv) {
  int nthreads = argc > 1 ? atoi(argv[1]) : 8;
  int reps = argc > 2 ? atoi(argv[2]) : 16;
  const int band = 150;
  const int x_size = 1024;
  const int y = 2 * band + 1;
  const int alen = x_size + 2 * band;

  std::atomic<long long> sink{0};
  auto worker = [&](int seed) {
    std::mt19937 rng(seed);
    std::vector<uint8_t> A(alen), B(x_size);
    for (auto& c : A) c = rng() % 5;
    // B = noisy copy of A's middle so the DP takes realistic paths
    for (int i = 0; i < x_size; ++i)
      B[i] = (rng() % 20 == 0) ? rng() % 5 : A[band + i];
    std::vector<int32_t> sw((size_t)x_size * y);
    long long acc = 0;
    for (int r = 0; r < reps; ++r) {
      // row 0: fresh-start row (begin_a = band so pos = j)
      for (int j = 0; j < y; ++j) {
        int pos = j;
        int32_t d = base_score(A[pos], B[0]);
        int32_t v = std::max(d, GAP);
        if (j > 0) v = std::max(v, sw[j - 1]);  // row-0 left unpenalized
        sw[j] = v;
      }
      for (int i = 1; i < x_size; ++i) {
        int32_t* row = &sw[(size_t)i * y];
        const int32_t* prev = &sw[(size_t)(i - 1) * y];
        for (int j = 0; j < y; ++j) {
          int pos = i + j;  // begin_a = band
          if (pos >= alen) { row[j] = 0; continue; }
          int32_t d = prev[j] + base_score(A[pos], B[i]);
          int32_t v = (j == y - 1) ? d : std::max(d, prev[j + 1] + GAP);
          if (j > 0) v = std::max(v, row[j - 1] + GAP);
          row[j] = v;
        }
      }
      acc += sw[(size_t)(x_size - 1) * y + y / 2];
      B[r % x_size] = (B[r % x_size] + 1) % 5;  // vary input per rep
    }
    sink += acc;
  };

  auto t0 = std::chrono::steady_clock::now();
  std::vector<std::thread> ts;
  for (int t = 0; t < nthreads; ++t) ts.emplace_back(worker, t + 1);
  for (auto& t : ts) t.join();
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  double cells = (double)nthreads * reps * x_size * y;
  printf("CELLS_PER_SEC %.6g\n", cells / dt);
  fprintf(stderr, "sink=%lld dt=%.3fs\n", (long long)sink, dt);
  return 0;
}
