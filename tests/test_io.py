"""Format codec tests: FASTA, BGZF, BAM, .blocks, .isize, bam-list."""

import numpy as np
import pytest

from gam_ngs_tpu.io import bgzf, fasta
from gam_ngs_tpu.io import bam as bam_io
from gam_ngs_tpu.io import blocks_io, bamlist, isize as isize_io
from gam_ngs_tpu.utils.cppfmt import cpp_double

import testutil


class TestFasta:
    def test_roundtrip_60col(self, tmp_path):
        p = str(tmp_path / "x.fasta")
        seq = "ACGT" * 40  # 160 bases -> lines of 60/60/40
        fasta.write_fasta(p, [("ctg1", fasta.seq_to_codes(seq))])
        raw = open(p, "rb").read()
        lines = raw.decode().split("\n")
        assert lines[0] == ">ctg1"
        assert [len(l) for l in lines[1:4]] == [60, 60, 40]
        assert raw.endswith(b"\n") and not raw.endswith(b"\n\n")
        back = fasta.read_fasta(p)
        assert back[0][0] == "ctg1"
        assert fasta.codes_to_bytes(back[0][1]).decode() == seq

    def test_name_truncated_at_space(self, tmp_path):
        p = str(tmp_path / "x.fasta")
        open(p, "w").write(">ctg1 extra comment\nACGT\n")
        assert fasta.read_fasta(p)[0][0] == "ctg1"

    def test_nonacgtn_maps_to_N_uppercased(self, tmp_path):
        p = str(tmp_path / "x.fasta")
        open(p, "w").write(">c\nacgtRYKM\n")
        name, codes = fasta.read_fasta(p)[0]
        assert fasta.codes_to_bytes(codes) == b"ACGTNNNN"

    def test_empty_contig(self, tmp_path):
        p = str(tmp_path / "x.fasta")
        fasta.write_fasta(p, [("e", np.zeros(0, np.uint8))])
        assert open(p, "rb").read() == b">e\n"

    def test_revcomp(self):
        codes = fasta.seq_to_codes("AACGTN")
        assert fasta.codes_to_bytes(fasta.reverse_complement(codes)) == b"NACGTT"


class TestBgzf:
    def test_roundtrip(self):
        data = b"hello world" * 10000
        comp = bgzf.compress(data)
        assert comp.endswith(bgzf.BGZF_EOF)
        assert bgzf.decompress(comp) == data

    def test_empty(self):
        assert bgzf.decompress(bgzf.compress(b"")) == b""


class TestBam:
    def test_write_read_roundtrip(self, tmp_path):
        p = str(tmp_path / "t.bam")
        recs = testutil.make_pe_records(
            "read1", "ACGTACGTAC", 0, 5, False, "TTTTTTTTTT", 0, 100, True,
            nh=1, xt="U")
        recs += testutil.make_pe_records(
            "read2", "ACGTACGTAC", 1, 50, True, "GGGGGGGGGG", 0, 10, False,
            nh=3, xt="R")
        testutil.write_sorted_bam(p, ["c1", "c2"], [1000, 500], recs)

        bf = bam_io.read_bam(p)
        assert bf.header.ref_names == ["c1", "c2"]
        assert bf.header.ref_lengths == [1000, 500]
        t = bf.table
        assert len(t) == 4
        # coordinate order: (0,5) read1/1, (0,10) read2/2, (0,100) read1/2, (1,50)
        assert t.ref_id.tolist() == [0, 0, 0, 1]
        assert t.pos.tolist() == [5, 10, 100, 50]
        assert t.end_pos.tolist() == [15, 20, 110, 60]
        assert t.nh.tolist() == [1, 3, 1, 3]
        assert t.xt.tolist() == [ord("U"), ord("R"), ord("U"), ord("R")]
        # same name -> same hash; different names -> different
        assert t.name_h1[0] == t.name_h1[2] and t.name_h2[0] == t.name_h2[2]
        assert t.name_h1[0] != t.name_h1[1]

    def test_cigar_ref_consumption(self, tmp_path):
        p = str(tmp_path / "t.bam")
        rec = dict(name="x", flag=0, ref_id=0, pos=10,
                   cigar=[(5, "S"), (10, "M"), (2, "D"), (3, "I"), (10, "M")],
                   seq="A" * 28, tags=b"")
        bam_io.write_bam(p, ["c"], [100], [rec])
        t = bam_io.read_bam(p).table
        # ref consumed: 10 M + 2 D + 10 M = 22
        assert t.end_pos[0] - t.pos[0] == 22
        assert t.l_seq[0] == 28


class TestBlocksIO:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.blocks")
        rows = [
            (12, 0, ord("+"), 10, 99, 600, 1200, 3, ord("-"), 5, 94, 600, 1100),
            (5, 1, ord("+"), 0, 49, 250, 500, 2, ord("+"), 0, 49, 250, 400),
        ]
        bt = blocks_io.BlockTable.from_rows(rows)
        blocks_io.write_blocks(p, bt)
        content = open(p).read()
        assert content.startswith("# MasterAssemblyID\t")
        assert "12\t0\t0\t+\t10\t99\t600\t1200\t0\t3\t-\t5\t94\t600\t1100\n" in content
        back = blocks_io.load_blocks(p)
        assert len(back) == 2
        assert back.row(0) == rows[0]
        assert back.row(1) == rows[1]

    def test_min_block_size_filter(self, tmp_path):
        p = str(tmp_path / "x.blocks")
        rows = [(12, 0, ord("+"), 0, 9, 1, 1, 0, ord("+"), 0, 9, 1, 1),
                (4, 0, ord("+"), 0, 9, 1, 1, 0, ord("+"), 0, 9, 1, 1)]
        blocks_io.write_blocks(p, blocks_io.BlockTable.from_rows(rows))
        assert len(blocks_io.load_blocks(p, min_block_size=5)) == 1


class TestCppFmt:
    @pytest.mark.parametrize("x,s", [
        (0.0, "0"), (1.0, "1"), (169.37123, "169.371"), (0.75, "0.75"),
        (1234567.0, "1.23457e+06"), (29.9999999, "30"), (1e-5, "1e-05"),
        (123456.0, "123456"), (3.14159265, "3.14159"),
    ])
    def test_matches_cpp_ostream(self, x, s):
        assert cpp_double(x) == s


class TestIsize:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.isize")
        isize_io.write_isize(p, ["a.bam", "b.bam"], [169.37123, 3000.5],
                             [25.12345, 300.0], [31.001, 12.5])
        content = open(p).read()
        assert content == ("a.bam\n169.371\t25.1234\t31.001\n"
                           "b.bam\n3000.5\t300\t12.5\n")
        m, s, c = isize_io.read_isize(p, ["a.bam", "b.bam"])
        assert m == [169.371, 3000.5]

    def test_filename_mismatch(self, tmp_path):
        p = str(tmp_path / "x.isize")
        isize_io.write_isize(p, ["a.bam"], [1.0], [1.0], [1.0])
        with pytest.raises(ValueError):
            isize_io.read_isize(p, ["z.bam"])


class TestBamList:
    def test_parse(self, tmp_path):
        p = str(tmp_path / "list.txt")
        open(p, "w").write("a.bam\n100 300\nb.bam\n\nc.bam\n50 200\n")
        names, mn, mx = bamlist.load_bam_file_names(p)
        assert names == ["a.bam", "b.bam", "c.bam"]
        assert mn == [100, 0, 50]
        assert mx == [300, 0, 200]
