#!/usr/bin/env bash
# Smoke test mirroring the reference's test_run.sh (build a small DB,
# identify a single-strain sample and a two-strain mixture).  The
# reference ships Test_genomes/ + Sim_Data fixtures; those archives are
# absent from its checkout, so this generates equivalent synthetic ones.
set -euo pipefail
cd "$(dirname "$0")"
WORK="${1:-$(mktemp -d /tmp/strainscan_smoke_XXXX)}"
echo "workdir: $WORK"

python - "$WORK" <<'EOF'
import os, sys
import numpy as np

work = sys.argv[1]
rng = np.random.default_rng(7)
bases = np.array(list("ACGT"))
gdir = os.path.join(work, "Test_genomes")
os.makedirs(gdir, exist_ok=True)

def mutate(seq, n):
    s = np.array(list(seq))
    for p in rng.choice(len(s), size=n, replace=False):
        s[p] = rng.choice([b for b in bases if b != s[p]])
    return "".join(s)

base_a = "".join(rng.choice(bases, size=100_000))
strains = {"GA_1": base_a, "GA_2": mutate(base_a, 60),
           "GB_1": "".join(rng.choice(bases, size=100_000))}
for n, s in strains.items():
    with open(os.path.join(gdir, n + ".fa"), "w") as f:
        f.write(f">{n}\n{s}\n")

def reads(seq, depth):
    comp = str.maketrans("ACGT", "TGCA")
    out = []
    for _ in range(int(len(seq) * depth / 100)):
        p = int(rng.integers(0, len(seq) - 100))
        r = seq[p : p + 100]
        if rng.random() < 0.5:
            r = r.translate(comp)[::-1]
        out.append(r)
    return out

with open(os.path.join(work, "single.fq"), "w") as f:
    for i, r in enumerate(reads(strains["GA_1"], 8)):
        f.write(f"@r{i}\n{r}\n+\n{'I'*100}\n")
with open(os.path.join(work, "mix.fq"), "w") as f:
    for i, r in enumerate(reads(strains["GA_1"], 5) + reads(strains["GB_1"], 5)):
        f.write(f"@r{i}\n{r}\n+\n{'I'*100}\n")
print("fixtures written")
EOF

python -m strainscan_tpu.cli build -i "$WORK/Test_genomes" -o "$WORK/DB"
python -m strainscan_tpu.cli identify -i "$WORK/single.fq" -d "$WORK/DB" -o "$WORK/out_single"
python -m strainscan_tpu.cli identify -i "$WORK/mix.fq" -d "$WORK/DB" -o "$WORK/out_mix"

echo "=== single-strain sample ==="
cat "$WORK/out_single/final_report.txt"
echo "=== two-strain mixture ==="
cat "$WORK/out_mix/final_report.txt"
grep -q GA_1 "$WORK/out_single/final_report.txt"
grep -q GA_1 "$WORK/out_mix/final_report.txt"
grep -q GB_1 "$WORK/out_mix/final_report.txt"
echo "SMOKE OK"
