import os
import sys

sys.path.insert(0, "/root/repo")


class _Record:
    def __init__(self, rid, seq):
        self.id = rid
        self.seq = seq


def parse(filename, format=None):
    from centroflye_tpu.io import iter_seqs
    for rid, seq in iter_seqs(filename):
        yield _Record(rid, seq)
