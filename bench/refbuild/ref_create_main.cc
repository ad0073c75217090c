// Differential driver: builds the REFERENCE's gam-create pipeline
// (src/CreateBlocks.cc + lib + vendored BamTools, all compiled
// UNMODIFIED from /root/reference) with a plain argv parser replacing
// boost::program_options.  The resulting binary is the oracle for
// tests/test_ref_differential.py: its .blocks/.isize outputs are
// diffed byte-for-byte against gam_ngs_tpu's engines.
//
// gam-merge cannot be built this way: its graph layer is written
// against boost::graph (adjacency_list/BGL algorithms), which is not
// in this image and is not shim-able at this size — see BASELINE.md.

#include <cstdlib>
#include <cstring>
#include <iostream>
#include <string>

#include "CreateBlocks.hpp"
#include "OptionsCreate.hpp"

using namespace options;
using namespace modules;

OptionsCreate g_options;

// OptionsCreate::process is declared in the header but defined in
// OptionsCreate.cc (not compiled here: it needs program_options); the
// vtable wants a definition, and main() below parses argv instead.
bool OptionsCreate::process(int argc, char* argv[]) {
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
    else if (a == "--min-block-size")
      minBlockSize = atoi(need("--min-block-size"));
    else if (a == "--no-mult-filter")
      noMultiplicityFilter = true;
    else if (a == "--output")
      outputFilePrefix = need("--output");
    else if (a == "--debug")
      debug = true;
    else {
      std::cerr << "unknown option " << a << std::endl;
      return false;
    }
  }
  program_mode = program_create_blocks;
  return !masterBamFile.empty() && !slaveBamFile.empty();
}

int main(int argc, char* argv[]) {
  if (!g_options.process(argc, argv)) exit(2);
  CreateBlocks createBlocks;
  createBlocks.execute();
  return 0;
}
