import numpy as np
import pytest

from memo_tpu.io import fasta


def test_read_fasta_multirecord(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">a desc here\nACGT\nacg\n>b\nTTTT\n")
    recs = fasta.read_fasta(p)
    assert [r.name for r in recs] == ["a", "b"]
    assert recs[0].seq.tobytes() == b"ACGTacg"
    assert recs[1].seq.tobytes() == b"TTTT"


def test_upper():
    rec = fasta.FastaRecord("x", np.frombuffer(b"acgtN", np.uint8).copy())
    assert rec.upper().seq.tobytes() == b"ACGTN"


def test_reverse_complement_iupac_and_case():
    rec = fasta.FastaRecord("x", np.frombuffer(b"ACGTacgtNRYKMn", np.uint8).copy())
    rc = fasta.reverse_complement(rec)
    assert rc.name == "x/rc"
    # reverse of complement: complement(ACGTacgtNRYKMn) = TGCAtgcaNYRMKn
    assert rc.seq.tobytes() == b"TGCAtgcaNYRMKn"[::-1]


def test_rc_involution():
    rng = np.random.default_rng(0)
    seq = rng.choice(np.frombuffer(b"ACGT", np.uint8), 100)
    rec = fasta.FastaRecord("r", seq)
    back = fasta.reverse_complement(fasta.reverse_complement(rec))
    assert np.array_equal(back.seq, seq)


def test_with_reverse_complements_order():
    a = fasta.FastaRecord("a", np.frombuffer(b"AC", np.uint8).copy())
    b = fasta.FastaRecord("b", np.frombuffer(b"GG", np.uint8).copy())
    out = fasta.with_reverse_complements([a, b])
    assert [r.name for r in out] == ["a", "b", "a/rc", "b/rc"]


def test_fai_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">chr1\nACGTACGT\nAC\n>chr2\nTT\n")
    fai = fasta.write_fai(p)
    rows = open(fai).read().splitlines()
    assert rows[0].split("\t")[:2] == ["chr1", "10"]
    assert rows[1].split("\t")[:2] == ["chr2", "2"]
    ivals = fasta.parse_fai(fai)
    assert ivals == [("chr1", 0, 10), ("chr2", 10, 12)]


def test_fai_matches_samtools_layout(tmp_path):
    # offset/linebases/linewidth columns follow the samtools definition
    p = tmp_path / "x.fa"
    p.write_text(">a\nACGT\nACGT\nAC\n")
    (name, length, off, lb, lw), = fasta.fai_entries(p)
    assert (name, length, off, lb, lw) == ("a", 10, 3, 4, 5)


def test_write_fasta_single_line(tmp_path):
    p = tmp_path / "y.fa"
    recs = [fasta.FastaRecord("r", np.frombuffer(b"ACGTT", np.uint8).copy())]
    fasta.write_fasta(p, recs)
    assert p.read_bytes() == b">r\nACGTT\n"


def test_empty_fasta_raises(tmp_path):
    p = tmp_path / "e.fa"
    p.write_text("")
    with pytest.raises(ValueError):
        fasta.read_fasta(p)


def test_preprocess_sterilizer_matches_reference_contract(tmp_path):
    """stdin->stdout sterilizer: uppercase, 80-col wrap, reference header
    suffixes (reference preprocess_moni_fasta.py:33-54)."""
    import io as _io

    from memo_tpu.io.preprocess import sterilize

    fa = ">r1 desc\nacgt\nACGT\n>r2\n" + "a" * 100 + "\n"
    out = _io.StringIO()
    sterilize(_io.StringIO(fa), out)
    assert out.getvalue() == ">r1\nACGTACGT\n>r2\n" + "A" * 80 + "\n" + "A" * 20 + "\n"

    out = _io.StringIO()
    sterilize(_io.StringIO(">r\nACGTN\n"), out, reverse=True, complement=True)
    assert out.getvalue() == ">r_reverse_complement\nNACGT\n"

    out = _io.StringIO()
    sterilize(_io.StringIO(">r\nACG\n"), out, reverse=True)
    assert out.getvalue() == ">r_reverse\nGCA\n"

    out = _io.StringIO()
    sterilize(_io.StringIO(">r\nACG\n"), out, complement=True)
    assert out.getvalue() == ">r_complement\nTGC\n"
