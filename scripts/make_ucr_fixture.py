"""Generate the committed UCR-format fixture (tests/fixtures/
ucr_synth_{TRAIN,TEST}.csv) — deterministic, seed-pinned. Three
waveform classes (sine / ramp / square) of length 32 with enough
Gaussian noise that 1-NN accuracy is nontrivial (<1.0). Line 1 of
each file is a real-looking record that the harness must DROP
(mirrors slurp_file's `.skip(1)` — see operators/ucr.py docstring).

Run once; the CSVs are committed. Re-running reproduces them
byte-for-byte (fixed seed, fixed repr via %.6f).
"""
import os

import numpy as np

L = 32
PER_CLASS_TRAIN = 10
PER_CLASS_TEST = 10
NOISE = 1.3
rng = np.random.default_rng(20260814)

t = np.linspace(0, 2 * np.pi, L)
PROTO = {
    1: np.sin(t),
    2: np.linspace(-1, 1, L),
    3: np.sign(np.sin(2 * t)) * 0.8,
}


def rows(per_class):
    out = []
    for label, proto in PROTO.items():
        for _ in range(per_class):
            v = proto + rng.normal(0.0, NOISE, L)
            out.append((label, v))
    order = rng.permutation(len(out))
    return [out[i] for i in order]


def write(path, per_class):
    recs = rows(per_class + 1)  # +1: the first line is dropped by readers
    with open(path, "w") as f:
        for label, v in recs[: 3 * per_class + 1]:
            f.write(str(label) + "," + ",".join("%.6f" % x for x in v) + "\n")


here = os.path.dirname(os.path.abspath(__file__))
fix = os.path.join(here, "..", "tests", "fixtures")
os.makedirs(fix, exist_ok=True)
write(os.path.join(fix, "ucr_synth_TRAIN.csv"), PER_CLASS_TRAIN)
write(os.path.join(fix, "ucr_synth_TEST.csv"), PER_CLASS_TEST)
print("wrote fixtures:", fix)
