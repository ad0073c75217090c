#!/bin/sh
# Build the reference gam-create differential oracle (ref-create) from
# the UNMODIFIED sources under /root/reference plus the header shims in
# shims/ (sparsehash / tiny boost pieces are absent from this image).
# Usage: sh build.sh [outdir]   (default: this directory)
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${GAM_REFERENCE:-/root/reference}
OUT=${1:-$HERE}
BT=$REF/lib/bamtools-2.3.0/src

test -d "$REF/src" || { echo "reference tree not found at $REF" >&2; exit 3; }

SRCS="$HERE/ref_create_main.cc
$REF/src/CreateBlocks.cc
$REF/src/Options.cc
$REF/lib/src/bam/MultiBamReader.cc
$REF/lib/src/assembly/Read.cc
$REF/lib/src/assembly/Block.cc
$REF/lib/src/assembly/Frame.cc
$REF/lib/src/UtilityFunctions.cc
$BT/api/BamAlignment.cpp
$BT/api/BamReader.cpp
$BT/api/BamWriter.cpp
$BT/api/SamHeader.cpp
$BT/api/SamProgram.cpp
$BT/api/SamProgramChain.cpp
$BT/api/SamReadGroup.cpp
$BT/api/SamReadGroupDictionary.cpp
$BT/api/SamSequence.cpp
$BT/api/SamSequenceDictionary.cpp
$BT/api/internal/bam/BamHeader_p.cpp
$BT/api/internal/bam/BamRandomAccessController_p.cpp
$BT/api/internal/bam/BamReader_p.cpp
$BT/api/internal/bam/BamWriter_p.cpp
$BT/api/internal/index/BamIndexFactory_p.cpp
$BT/api/internal/index/BamStandardIndex_p.cpp
$BT/api/internal/index/BamToolsIndex_p.cpp
$BT/api/internal/io/BamDeviceFactory_p.cpp
$BT/api/internal/io/BamFile_p.cpp
$BT/api/internal/io/BamFtp_p.cpp
$BT/api/internal/io/BamHttp_p.cpp
$BT/api/internal/io/HttpHeader_p.cpp
$BT/api/internal/io/BamPipe_p.cpp
$BT/api/internal/io/BgzfStream_p.cpp
$BT/api/internal/io/ByteArray_p.cpp
$BT/api/internal/io/HostAddress_p.cpp
$BT/api/internal/io/HostInfo_p.cpp
$BT/api/internal/io/ILocalIODevice_p.cpp
$BT/api/internal/io/RollingBuffer_p.cpp
$BT/api/internal/io/TcpSocketEngine_p.cpp
$BT/api/internal/io/TcpSocketEngine_unix_p.cpp
$BT/api/internal/io/TcpSocket_p.cpp
$BT/api/internal/sam/SamFormatParser_p.cpp
$BT/api/internal/sam/SamFormatPrinter_p.cpp
$BT/api/internal/sam/SamHeaderValidator_p.cpp
$BT/api/internal/utils/BamException_p.cpp"

g++ -O2 -w -o "$OUT/ref-create" \
  -I "$HERE/shims" \
  -I "$REF/include" \
  -I "$REF/lib" \
  -I "$REF/lib/include" \
  -I "$BT" \
  $SRCS -lz -lpthread
echo "built $OUT/ref-create"

# gam-n50 is self-contained (no Boost/sparsehash): builds stock
g++ -O2 -w -o "$OUT/ref-n50" "$REF/src/n50.cc"
echo "built $OUT/ref-n50"

# gam-merge: the full reference merge pipeline, UNMODIFIED, against the
# minimal Boost.Graph shim (shims/boost/graph/) — source list from the
# reference's own CMakeLists.txt GAMNGSLIB_SRC_FILES (:58-87).
MERGE_SRCS="$HERE/ref_merge_main.cc
$REF/src/Merge.cc
$REF/src/Options.cc
$REF/lib/src/alignment/ablast.cc
$REF/lib/src/alignment/my_alignment.cc
$REF/lib/src/alignment/full_smith_waterman.cc
$REF/lib/src/alignment/banded_smith_waterman.cc
$REF/lib/src/assembly/contig.cc
$REF/lib/src/assembly/io_contig.cc
$REF/lib/src/assembly/nucleotide.cc
$REF/lib/src/assembly/Read.cc
$REF/lib/src/assembly/Frame.cc
$REF/lib/src/assembly/Block.cc
$REF/lib/src/bam/MultiBamReader.cc
$REF/lib/src/graphs/AssemblyGraph.cc
$REF/lib/src/graphs/CompactAssemblyGraph.cc
$REF/lib/src/graphs/PairingEvidencesGraph.cc
$REF/lib/src/pctg/BestCtgAlignment.cc
$REF/lib/src/pctg/BestPctgCtgAlignment.cc
$REF/lib/src/pctg/ContigInPctgInfo.cc
$REF/lib/src/pctg/CtgInPctgInfo.cc
$REF/lib/src/pctg/PairedContig.cc
$REF/lib/src/pctg/PctgBuilder.cc
$REF/lib/src/pctg/ThreadedBuildPctg.cc
$REF/lib/src/pctg/BuildPctgFunctions.cc
$REF/lib/src/pool/HashContigMemPool.cc
$REF/lib/src/strand_fixer/RelativeStrand.cc
$REF/lib/src/strand_fixer/RelativeStrandEvidences.cc
$REF/lib/src/strand_fixer/StrandProbability.cc
$REF/lib/src/PartitionFunctions.cc
$REF/lib/src/UtilityFunctions.cc"

BT_SRCS="$BT/api/BamAlignment.cpp
$BT/api/BamReader.cpp
$BT/api/BamWriter.cpp
$BT/api/SamHeader.cpp
$BT/api/SamProgram.cpp
$BT/api/SamProgramChain.cpp
$BT/api/SamReadGroup.cpp
$BT/api/SamReadGroupDictionary.cpp
$BT/api/SamSequence.cpp
$BT/api/SamSequenceDictionary.cpp
$BT/api/internal/bam/BamHeader_p.cpp
$BT/api/internal/bam/BamRandomAccessController_p.cpp
$BT/api/internal/bam/BamReader_p.cpp
$BT/api/internal/bam/BamWriter_p.cpp
$BT/api/internal/index/BamIndexFactory_p.cpp
$BT/api/internal/index/BamStandardIndex_p.cpp
$BT/api/internal/index/BamToolsIndex_p.cpp
$BT/api/internal/io/BamDeviceFactory_p.cpp
$BT/api/internal/io/BamFile_p.cpp
$BT/api/internal/io/BamFtp_p.cpp
$BT/api/internal/io/BamHttp_p.cpp
$BT/api/internal/io/HttpHeader_p.cpp
$BT/api/internal/io/BamPipe_p.cpp
$BT/api/internal/io/BgzfStream_p.cpp
$BT/api/internal/io/ByteArray_p.cpp
$BT/api/internal/io/HostAddress_p.cpp
$BT/api/internal/io/HostInfo_p.cpp
$BT/api/internal/io/ILocalIODevice_p.cpp
$BT/api/internal/io/RollingBuffer_p.cpp
$BT/api/internal/io/TcpSocketEngine_p.cpp
$BT/api/internal/io/TcpSocketEngine_unix_p.cpp
$BT/api/internal/io/TcpSocket_p.cpp
$BT/api/internal/sam/SamFormatParser_p.cpp
$BT/api/internal/sam/SamFormatPrinter_p.cpp
$BT/api/internal/sam/SamHeaderValidator_p.cpp
$BT/api/internal/utils/BamException_p.cpp"

g++ -O2 -w -std=c++11 -o "$OUT/ref-merge" \
  -I "$HERE/shims" \
  -I "$REF/include" \
  -I "$REF/lib" \
  -I "$REF/lib/include" \
  -I "$BT" \
  $MERGE_SRCS $BT_SRCS -lz -lpthread
echo "built $OUT/ref-merge"

# ref-merge-zi: the SAME merge sources with -ftrivial-auto-var-init=zero
# (no source edit).  Rationale: when no MP library is supplied, the
# reference's getRegionScore reads uninitialized mp_weight/mp_rnum/
# mp_min_cov stack slots (CompactAssemblyGraph.cc:334-358 — real UB,
# found by the ref-merge differential; PARITY.md).  Zero-initialized,
# mp_rnum == 0 < 10 degenerates the arbitration to "PE result if
# pe_rnum >= 10 else (-5, 0)" — exactly the defined PE-only semantics
# gam_ngs_tpu/graphs/compact.py::_combine_pe_mp implements with its
# (-4.0, 0, False) MP stand-in — so PE-only corpora become
# byte-comparable (tests/test_ref_differential.py PE-only cases).
g++ -O2 -w -std=c++11 -ftrivial-auto-var-init=zero \
  -o "$OUT/ref-merge-zi" \
  -I "$HERE/shims" \
  -I "$REF/include" \
  -I "$REF/lib" \
  -I "$REF/lib/include" \
  -I "$BT" \
  $MERGE_SRCS $BT_SRCS -lz -lpthread
echo "built $OUT/ref-merge-zi"

# ref-bsw: stdin/stdout oracle around the reference's own
# BandedSmithWaterman::find_alignment (per-window kernel differentials)
g++ -O2 -w -std=c++11 -o "$OUT/ref-bsw" \
  -I "$HERE/shims" \
  -I "$REF/include" \
  -I "$REF/lib" \
  -I "$REF/lib/include" \
  -I "$BT" \
  "$HERE/ref_bsw_main.cc" \
  $REF/lib/src/alignment/banded_smith_waterman.cc \
  $REF/lib/src/alignment/my_alignment.cc \
  $REF/lib/src/assembly/contig.cc \
  $REF/lib/src/assembly/nucleotide.cc
echo "built $OUT/ref-bsw"
