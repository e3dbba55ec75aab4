"""Alt-call (7-column) SD report parser vs the reference's sd_parser_new
run as a subprocess oracle (reference sd_parser_new.py — dead code in the
reference pipelines, parsed here for inventory completeness)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from centroflye_tpu.mono.sd_parser_alt import (
    parse_alt_sd_report, get_stats, GAP_SYMB)

REF = "/root/reference/scripts"
STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ref_stubs")


def _make_world(tmp_path, rng):
    from centroflye_tpu.io import write_seqs
    from centroflye_tpu.pipeline.simulate import gen_random_seq

    names = [f"mono_{c}" for c in "ABCDEFG"]
    monomers = {n: gen_random_seq(rng, 170 + i)
                for i, n in enumerate(names)}
    mono_fn = str(tmp_path / "monomers.fasta")
    write_seqs(mono_fn, monomers)

    rows = []
    # read 1: forward, one ambiguous call, one large gap
    pos = 0
    for i, n in enumerate(["mono_A", "mono_B", "mono_C", "mono_D",
                           "mono_E", "mono_B"]):
        st = pos
        en = st + 170
        if i == 3:
            st += 700    # large gap before this monomer
            en = st + 170
        alt = "mono_F" if i == 4 else "None"
        rows.append(("read1", n, st, en, -11.5, alt,
                     -20.0 if alt != "None" else "None"))
        pos = en + 5
    # read 2: reverse majority (lowercase flip)
    pos = 0
    for n in ["mono_C'", "mono_B'", "mono_A'", "mono_G'"]:
        rows.append(("read2", n, pos, pos + 168, -9.0, "None", "None"))
        pos += 172
    # read 3: ambiguous everywhere -> empty after strip
    rows.append(("read3", "mono_A", 0, 170, -5.0, "mono_B", -5.5))

    tsv_fn = str(tmp_path / "final_decomposition.tsv")
    with open(tsv_fn, "w") as f:
        for row in rows:
            print(*row, sep="\t", file=f)
    return mono_fn, tsv_fn


def test_alt_parser_matches_reference(tmp_path):
    rng = np.random.default_rng(3)
    mono_fn, tsv_fn = _make_world(tmp_path, rng)
    report = parse_alt_sd_report(tsv_fn, mono_fn)

    ref_script = os.path.join(REF, "sd_parser_new.py")
    if not os.path.exists(ref_script):
        pytest.skip("reference not mounted")
    code = (
        "import sys; sys.argv=['x']\n"
        # the reference targets 2019-era pandas, where the literal string
        # 'None' was NOT a default NA value; modern pandas turns it into
        # NaN and the alt_call == 'None' comparison always fails — restore
        # the period-correct read_csv semantics for the oracle
        "import pandas as pd\n"
        "_orig = pd.read_csv\n"
        "pd.read_csv = lambda *a, **k: _orig("
        "*a, keep_default_na=False, **k)\n"
        "from sd_parser_new import SD_Report\n"
        f"rep = SD_Report({tsv_fn!r}, {mono_fn!r})\n"
        "for r_id in sorted(rep.records):\n"
        "    rec = rep.records[r_id]\n"
        "    print(r_id, rec.strand, rec.string, rec.split_strings,"
        " rec.gaps)\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = STUBS + ":" + REF
    res = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr[-2000:]
    for line in res.stdout.strip().splitlines():
        r_id, strand, rest = line.split(" ", 2)
        string = rest.split(" ", 1)[0] if not rest.startswith("[") else ""
        ours = report.records[r_id]
        assert ours.strand == strand, r_id
        got_line = f"{r_id} {ours.strand} {ours.string} " \
                   f"{ours.split_strings} {ours.gaps}"
        assert got_line == line, (got_line, line)

    stats = get_stats(report.get_monomer_strings())
    assert stats["ntranslations"] == 2      # read3 strips to empty
    assert stats["ngaps"] >= 1
