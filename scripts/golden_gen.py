"""Generate golden values for the bundled 100^3 sample (CPU, float64)."""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import openimpala_tpu
from openimpala_tpu.io.tiff import TiffReader
from openimpala_tpu.props.volume_fraction import volume_fraction
from openimpala_tpu.props.tortuosity import tortuosity
from openimpala_tpu.props.effective_diffusivity import effective_diffusivity

r = TiffReader("/root/reference/SampleData_2Phase_stack_3d_1bit.tif")
phase = r.threshold(0.5)
out = {"vf_phase0": volume_fraction(phase, 0), "vf_phase1": volume_fraction(phase, 1)}
for pid in (0, 1):
    for d in "XYZ":
        t0 = time.time()
        res = tortuosity(phase, pid, d, eps=1e-10, precond="mg", inner_dtype=None)
        out[f"tau_p{pid}_{d}"] = res.value
        out[f"active_vf_p{pid}_{d}"] = res.active_vf
        print(f"tau p{pid} {d}: {res.value:.9f} active_vf={res.active_vf:.6f} "
              f"iters={res.iterations} rel={res.rel_res:.1e} t={time.time()-t0:.0f}s",
              flush=True)
t0 = time.time()
eres = effective_diffusivity(phase, 1, eps=1e-10, precond="mg", inner_dtype=None)
out["deff_p1"] = np.asarray(eres.deff).tolist()
print("Deff p1 diag:", np.diag(eres.deff), f"t={time.time()-t0:.0f}s", flush=True)
with open("/tmp/golden.json", "w") as f:
    json.dump(out, f, indent=1)
print("WROTE /tmp/golden.json")
