import numpy as np
import pytest

from centroflye_tpu.io import (
    encode, decode, encode_batch, revcomp, revcomp_str,
    compress_homopolymer, min_cyclic_shift, kmer_codes, kmer_strings,
)
from centroflye_tpu.io.encoding import (
    string_to_kmer_code, split_u64, join_u64, PAD,
)


def test_encode_decode_roundtrip():
    s = "ACGTACGTN"
    codes = encode(s)
    assert codes.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 4]
    assert decode(codes) == s


def test_encode_lowercase():
    assert encode("acgt").tolist() == [0, 1, 2, 3]


def test_encode_batch_padding():
    codes, lens = encode_batch(["ACG", "TTTTT"])
    assert codes.shape == (2, 5)
    assert lens.tolist() == [3, 5]
    assert codes[0, 3] == PAD and codes[0, 4] == PAD


def test_revcomp():
    assert decode(revcomp(encode("AACGT"))) == "ACGTT"
    assert revcomp_str("AACGT") == "ACGTT"
    assert revcomp_str("AA-GT") == "AC-TT"


def test_compress_homopolymer():
    # same behavior as reference utils/bio.py:60-61
    assert compress_homopolymer("AAACCGTT") == "ACGT"
    assert compress_homopolymer("") == ""
    assert compress_homopolymer("ABBBA") == "ABA"


def test_min_cyclic_shift_matches_bruteforce(rng):
    # reference utils/bio.py:191-194 semantics
    for _ in range(50):
        n = int(rng.integers(1, 12))
        s = "".join("ABC"[i] for i in rng.integers(0, 3, size=n))
        brute = min(s[i:] + s[:i] for i in range(len(s)))
        assert min_cyclic_shift(s) == brute


def test_kmer_codes_lexicographic_order():
    s = "ACGTT"
    codes, valid = kmer_codes(encode(s), k=3)
    assert valid.all()
    assert kmer_strings(codes, 3) == ["ACG", "CGT", "GTT"]
    # numeric order == lexicographic order
    strs = kmer_strings(np.sort(codes), 3)
    assert strs == sorted(strs)


def test_kmer_codes_invalid_windows():
    s = "ACGNACG"
    codes, valid = kmer_codes(encode(s), k=3)
    assert valid.tolist() == [True, False, False, False, True]


def test_kmer_codes_matches_string_windows(make_dna):
    s = make_dna(200)
    k = 19
    codes, valid = kmer_codes(encode(s), k=k)
    assert valid.all()
    expect = [s[i:i + k] for i in range(len(s) - k + 1)]
    assert kmer_strings(codes, k) == expect
    assert [string_to_kmer_code(km) for km in expect] == codes.tolist()


def test_split_join_u64(rng):
    vals = rng.integers(0, 2**63, size=100, dtype=np.uint64)
    hi, lo = split_u64(vals)
    assert (join_u64(hi, lo) == vals).all()


def test_fasta_roundtrip(tmp_path):
    from centroflye_tpu.io import read_seqs, write_seqs, read_seq, iter_seqs
    seqs = {"r1": "ACGT", "r2 desc": "TTTT"}
    fn = str(tmp_path / "x.fasta")
    write_seqs(fn, {"r1": "ACGT", "r2": "TTTT"})
    assert read_seqs(fn) == {"r1": "ACGT", "r2": "TTTT"}
    assert read_seq(fn) == "ACGT"
    assert list(iter_seqs(fn)) == [("r1", "ACGT"), ("r2", "TTTT")]


def test_fasta_multiline_and_id_token(tmp_path):
    fn = str(tmp_path / "y.fa")
    with open(fn, "w") as f:
        f.write(">read1 some description\nACGT\nACGT\n>read2\nGG\n")
    from centroflye_tpu.io import read_seqs
    assert read_seqs(fn) == {"read1": "ACGTACGT", "read2": "GG"}


def test_fastq_gz(tmp_path):
    import gzip
    fn = str(tmp_path / "z.fastq.gz")
    with gzip.open(fn, "wt") as f:
        f.write("@r1\nACGT\n+\nIIII\n@r2 x\nGGCC\n+\nIIII\n")
    from centroflye_tpu.io import read_seqs
    assert read_seqs(fn) == {"r1": "ACGT", "r2": "GGCC"}


def test_atomic_write_crash_safety(tmp_path):
    """A writer killed mid-stream must leave NOTHING at the artifact
    path (stage artifacts double as resume checkpoints — a partial
    file would be trusted as a completed stage on the next run)."""
    import os
    import pytest
    from centroflye_tpu.io import atomic_write, read_seqs

    fn = str(tmp_path / "art.fasta")
    with pytest.raises(RuntimeError):
        with atomic_write(fn) as f:
            f.write(">r1\nACGT\n")
            raise RuntimeError("simulated kill")
    assert not os.path.exists(fn)
    assert os.listdir(str(tmp_path)) == []          # no tmp litter

    # clean exit replaces atomically, overwriting a stale artifact
    with atomic_write(fn) as f:
        f.write(">r1\nACGT\n")
    with atomic_write(fn) as f:
        f.write(">r2\nTTTT\n")
    assert read_seqs(fn) == {"r2": "TTTT"}
    assert os.listdir(str(tmp_path)) == ["art.fasta"]
