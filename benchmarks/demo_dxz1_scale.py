"""SMALL-SCALE smoke demo: a 50-unit array at coverage 7, d<=10, 1%
read noise — roughly 1/30 of the real DXZ1 array at 1/5 the coverage.
Useful as a fast end-to-end sanity run. The PRODUCTION-shape demo
(1,500 units, coverage 32, d<=150, 8% ONT-like noise, rel2 length mix)
is benchmarks/demo_cenx_production.py."""
import os, shutil, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from centroflye_tpu.config import *
from centroflye_tpu.io import write_seqs, read_seq
from centroflye_tpu.io.encoding import revcomp_str
from centroflye_tpu.pipeline import simulate as sim_mod
from centroflye_tpu.pipeline.cenx import CenXPipeline
from centroflye_tpu.ops.align_path import align_path

t_all = time.time()
unit = read_seq('/root/repo/centroflye_tpu/data/DXZ1_rc.fasta')
rng = np.random.default_rng(9)
MULT, FLANK = 50, 20000
sim = sim_mod.simulate_tandem_repeat(rng, unit, MULT, 0.003, flank_len=FLANK)
g = sim.flanked_tr
ts, te = FLANK, FLANK + len(sim.tr)
reads = {}
for pi, left in enumerate([9000, 8000, 7000]):
    reads[f'pre{pi}'] = g[ts-left:ts+6*2055]
i = 0
start = ts
while start + 10000 < te:
    seq = g[start:start+10000]
    if i % 3 == 1: seq = revcomp_str(seq)
    reads[f'int{i:03d}'] = seq
    start += 1500; i += 1
for si, right in enumerate([9000, 8000]):
    reads[f'suf{si}'] = g[te-6*2055:te+right]
for b in range(30):
    reads[f'bg{b}'] = sim_mod.gen_random_seq(rng, 10000)
# mild noise
reads = {r: sim_mod.add_read_noise(rng, s, 0.01) for r, s in reads.items()}
print(f"{len(reads)} reads, tandem {len(sim.tr)} bp", flush=True)
shutil.rmtree('/tmp/dxz1_run', ignore_errors=True)
os.makedirs('/tmp/dxz1_sim', exist_ok=True)
write_seqs('/tmp/dxz1_sim/reads.fasta', reads)
# survival rate for k=19 at 1% noise ~ e^-0.19 ~ 0.83; coverage ~ 10000/1500 ~ 6.7
cfg = CentroFlyeConfig(
    coverage=7,
    recruitment=RecruitmentConfig(threshold=350, batch_size=128),
    decomposition=UnitDecompositionConfig(min_record_len=5000),
    kmer_recruitment=KmerRecruitmentConfig(k=19, min_distance=1, max_distance=10,
                                           min_coverage=3, bottom=0.9, top=3.0,
                                           kmer_survival_rate=0.83),
    placer=PlacerConfig(min_cloud_kmer_freq=2, min_unit=2, min_inters=6,
                        prefix_threshold=6000),
    consensus_unit=ConsensusUnitConfig(k=30),
    polisher=PolisherConfig(num_iters=2))
pipe = CenXPipeline(unit, cfg, '/tmp/dxz1_run')
final = pipe.run('/tmp/dxz1_sim/reads.fasta')
al = align_path(final, sim.tr, mode='HW')
print(f"DXZ1-scale: assembly {len(final)} bp vs tandem {len(sim.tr)} bp; "
      f"infix dist {al.dist} ({al.dist/max(len(final),1):.4f}); "
      f"total wall {time.time()-t_all:.0f}s", flush=True)
import json
print(json.dumps({k: {'wall_s': round(v.wall_s,1), 'items': v.items}
                  for k, v in pipe.metrics.stages.items()}))
