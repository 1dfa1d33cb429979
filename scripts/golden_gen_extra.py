"""Golden values for the OTHER two bundled reference fixtures (VERDICT r4
#6): spheres.tif (100^3, ~89% pore) and SampleData_2Phase_squared.tif
(64^3, ~40% pore) — float64 path at eps=1e-10, same recipe as
scripts/golden_gen.py for the blob volume.  Merges the results under
"spheres" / "squared" keys into tests/golden_sample_values.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from openimpala_tpu.io.tiff import TiffReader  # noqa: E402
from openimpala_tpu.props.volume_fraction import volume_fraction  # noqa: E402
from openimpala_tpu.props.tortuosity import tortuosity  # noqa: E402
from openimpala_tpu.props.effective_diffusivity import (  # noqa: E402
    effective_diffusivity,
)

FIXTURES = {
    "spheres": "/root/reference/data/spheres.tif",
    "squared": "/root/reference/data/SampleData_2Phase_squared.tif",
}
GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden_sample_values.json")


def main():
    out = {}
    for name, path in FIXTURES.items():
        phase = TiffReader(path).threshold(0.5)
        g = {"vf_phase0": volume_fraction(phase, 0),
             "vf_phase1": volume_fraction(phase, 1)}
        for d in "XYZ":
            t0 = time.time()
            res = tortuosity(phase, 1, d, eps=1e-10, precond="mg",
                             inner_dtype=None)
            g[f"tau_p1_{d}"] = res.value
            g[f"active_vf_p1_{d}"] = res.active_vf
            print(f"{name} tau p1 {d}: {res.value:.9f} "
                  f"active_vf={res.active_vf:.6f} iters={res.iterations} "
                  f"rel={res.rel_res:.1e} t={time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        eres = effective_diffusivity(phase, 1, eps=1e-10, precond="mg",
                                     inner_dtype=None)
        g["deff_p1"] = np.asarray(eres.deff).tolist()
        print(f"{name} Deff p1 diag: {np.diag(eres.deff)} "
              f"t={time.time()-t0:.0f}s", flush=True)
        out[name] = g
    golden = json.load(open(GOLDEN_PATH))
    golden.update(out)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"MERGED {list(out)} into {GOLDEN_PATH}")


if __name__ == "__main__":
    main()
