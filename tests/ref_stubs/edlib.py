"""Minimal python-edlib stub backed by this repo's own aligners, so the
reference's consensus/polisher stages can run for parity testing.
Supports the calls the reference makes: align(q, t, mode=..., task=...)
returning editDistance + locations."""
import sys

sys.path.insert(0, "/root/repo")


def align(query, target, mode="NW", task="distance", k=-1):
    from centroflye_tpu.ops.align_path import align_path

    if mode == "HW":
        al = align_path(query, target, mode="HW")
        return {"editDistance": al.dist,
                "locations": [(al.t_start, al.t_end - 1)],
                "cigar": None}
    al = align_path(query, target, mode="NW")
    return {"editDistance": al.dist,
            "locations": [(0, len(target) - 1)],
            "cigar": None}
