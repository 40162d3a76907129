import jax
jax.config.update("jax_platforms", "cpu")
import benchmarks.run_all as R

print("sde_vi...", flush=True)
ms = R.bench_sde_vi(True)
print("sde_vi ms:", ms, flush=True)
jax.config.update("jax_enable_x64", True)
print("vgp...", flush=True)
ms = R.bench_vgp_natgrad(500)
print("vgp ms:", ms, flush=True)
print("svgp...", flush=True)
ms = R.bench_svgp_natgrad(2000, 100)
print("svgp ms:", ms, flush=True)
