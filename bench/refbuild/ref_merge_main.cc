// Differential driver: builds the REFERENCE's gam-merge pipeline
// (src/Merge.cc + lib graph/pctg layers + vendored BamTools, all
// compiled UNMODIFIED from /root/reference) with a plain argv parser
// replacing boost::program_options and a minimal Boost.Graph shim
// (shims/boost/graph/) replacing the BGL.  The resulting binary is the
// merge-side oracle for tests/test_ref_differential.py: its
// .gam.fasta/.pctgs/... outputs are diffed byte-for-byte against
// gam_ngs_tpu's merge (canonical --threads 1 order).

#include <sys/stat.h>

#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>

#include "Merge.hpp"
#include "OptionsMerge.hpp"

using namespace options;
using namespace modules;

OptionsMerge g_options;

// OptionsMerge::process is declared in the header but defined in
// OptionsMerge.cc (not compiled here: it needs program_options); this
// definition replicates its observable behavior for the flags the
// differential uses (mandatory-file checks, derived .isize paths,
// defaults from Options::set_defaults in src/Options.cc).
bool OptionsMerge::process(int argc, char* argv[]) {
  struct stat st;
  auto must_exist = [&](const std::string& p, const char* what) {
    if (stat(p.c_str(), &st) != 0) {
      std::cerr << what << " " << p << " does not exist." << std::endl;
      exit(1);
    }
  };
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto need = [&](const char* what) -> const char* {
      if (i + 1 >= argc) {
        std::cerr << "missing value for " << what << std::endl;
        exit(2);
      }
      return argv[++i];
    };
    if (a == "--master-bam")
      masterBamFile = need("--master-bam");
    else if (a == "--slave-bam")
      slaveBamFile = need("--slave-bam");
    else if (a == "--master-mp-bam")
      masterMpBamFile = need("--master-mp-bam");
    else if (a == "--slave-mp-bam")
      slaveMpBamFile = need("--slave-mp-bam");
    else if (a == "--blocks-file")
      blocksFile = need("--blocks-file");
    else if (a == "--master-fasta")
      masterFastaFile = need("--master-fasta");
    else if (a == "--slave-fasta")
      slaveFastaFile = need("--slave-fasta");
    else if (a == "--min-block-size")
      minBlockSize = atoi(need("--min-block-size"));
    else if (a == "--threads") {
      threadsNum = atoi(need("--threads"));
      if (threadsNum < 1) threadsNum = 1;
    } else if (a == "--coverage-filter") {
      double c = atof(need("--coverage-filter"));
      if (coverageThreshold >= 0) coverageThreshold = c;
    } else if (a == "--no-mult-filter")
      noMultiplicityFilter = true;
    else if (a == "--output-graphs")
      outputGraphs = true;
    else if (a == "--output")
      outputFilePrefix = need("--output");
    else if (a == "--debug")
      debug = true;
    else {
      std::cerr << "unknown option " << a << std::endl;
      return false;
    }
  }
  if (masterBamFile.empty() || slaveBamFile.empty()) {
    std::cerr << "Both --master-bam and --slave-bam parameters are "
                 "mandatory." << std::endl;
    exit(1);
  }
  masterISizeFile = masterBamFile + ".isize";
  slaveISizeFile = slaveBamFile + ".isize";
  must_exist(masterBamFile, "Master's PE-alignments file");
  must_exist(slaveBamFile, "Slave's PE-aligments file");
  if (!masterMpBamFile.empty() || !slaveMpBamFile.empty()) {
    if (masterMpBamFile.empty() || slaveMpBamFile.empty()) {
      std::cerr << "Both --master-mp-bam and --slave-mp-bam have to be "
                   "specified, or none of them." << std::endl;
      exit(1);
    }
    must_exist(masterMpBamFile, "Master's MP-alignments file");
    must_exist(slaveMpBamFile, "Slave's MP-aligments file");
    masterMpISizeFile = masterMpBamFile + ".isize";
    slaveMpISizeFile = slaveMpBamFile + ".isize";
  }
  if (blocksFile.empty()) {
    std::cerr << "--blocks-file parameter is mandatory." << std::endl;
    exit(1);
  }
  must_exist(blocksFile, "Blocks' file");
  if (masterFastaFile.empty() || slaveFastaFile.empty()) {
    std::cerr << "Both --master-fasta and --slave-fasta parameters are "
                 "mandatory." << std::endl;
    exit(1);
  }
  must_exist(masterFastaFile, "Master-assembly's fasta file");
  must_exist(slaveFastaFile, "Slave-assembly's fasta file");
  program_mode = program_merge;
  return true;
}

int main(int argc, char* argv[]) {
  if (!g_options.process(argc, argv)) exit(2);
  Merge merge;
  merge.execute();
  return 0;
}
