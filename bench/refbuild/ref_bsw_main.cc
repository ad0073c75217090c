// BSW oracle driver: runs the REFERENCE's BandedSmithWaterman
// (lib/src/alignment/banded_smith_waterman.cc, compiled unmodified) on
// problems read from stdin, printing the resulting MyAlignment fields
// so tests can differentially compare our kernel per-window.
//
// stdin, per problem:
//   <len_a> <begin_a> <end_a> <len_b> <begin_b> <end_b> <fs> <fe>
//   <sequence a as ATCGN chars>
//   <sequence b as ATCGN chars>
// stdout, per problem:
//   <begin_a> <begin_b> <score> <homology(17 digits)> <edit string of
//    M/X/A/B for MATCH/MISMATCH/GAP_A/GAP_B>

#include <cstdio>
#include <iostream>
#include <string>
#include <vector>

#include "alignment/banded_smith_waterman.hpp"
#include "assembly/contig.hpp"

static Contig to_contig(const std::string& s) {
  Contig c(s.size());
  for (size_t i = 0; i < s.size(); ++i) c.at(i) = Nucleotide(s[i]);
  return c;
}

int main() {
  long la, ba, ea, lb, bb, eb;
  int fs, fe;
  std::string sa, sb;
  while (std::cin >> la >> ba >> ea >> lb >> bb >> eb >> fs >> fe >> sa >>
         sb) {
    Contig a = to_contig(sa);
    Contig b = to_contig(sb);
    BandedSmithWaterman bsw;
    MyAlignment aln =
        bsw.find_alignment(a, ba, ea, b, bb, eb, fs != 0, fe != 0);
    printf("%lld %lld %ld %.17g ", (long long)aln.begin_a(),
           (long long)aln.begin_b(), (long)aln.score(), aln.homology());
    const MyAlignment::SeqType& ed = aln.sequence();
    std::string s;
    for (size_t i = 0; i < ed.size(); ++i) {
      switch (ed[i]) {
        case MATCH: s += 'M'; break;
        case MISMATCH: s += 'X'; break;
        case GAP_A: s += 'A'; break;
        case GAP_B: s += 'B'; break;
        default: s += '?';
      }
    }
    printf("%s\n", s.empty() ? "-" : s.c_str());
    fflush(stdout);
  }
  return 0;
}
