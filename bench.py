#!/usr/bin/env python
"""Headline benchmark: aggregate GCMC step throughput per chip on the
ZIF-8-scale water-adsorption system (BASELINE.json flagship config), with
vmapped replica chains.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Per-phase timings and a bandwidth/compute utilization estimate go to stderr
(SURVEY.md section 5 tracing gap).

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is measured against the driver-supplied north-star target of 1e6
accepted-move-equivalent GCMC steps/sec/chip.

Env knobs: MANIAC_BENCH_REPLICAS / STEPS / BLOCKS / DTYPE / CAPACITY /
SYSTEM. MANIAC_BENCH_SYSTEM selects the workload (BASELINE.md perf matrix):

  zif     (default) ZIF-8-scale framework + water, single active species
  mixed   framework + water + dimer, TWO active species incl. swap moves
  resv    water GCMC with a RESERVOIR (geometry sampling + push/pop)
  tricl   triclinic water box (in-kernel 27-image min-image)
  bigS    reference-capacity envelope: ~2000 live waters, capacity 2500
          (the reference's static cap is 5000/type, src/parameters.f90:8)

Kernel-path selection is inherited from the engine (MANIAC_PALLAS /
MANIAC_GROUP), so stepg-vs-blockg rows can be recorded with env overrides.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_STEPS_PER_SEC = 1.0e6


def main() -> None:
    from maniac_tpu.utils.mapguard import ensure_map_headroom

    ensure_map_headroom()

    import jax
    import jax.numpy as jnp
    import numpy as np

    system = os.environ.get("MANIAC_BENCH_SYSTEM", "zif")
    replicas = int(os.environ.get("MANIAC_BENCH_REPLICAS", "1024"))
    steps_per_block = int(os.environ.get("MANIAC_BENCH_STEPS", "400"))
    n_blocks = int(os.environ.get("MANIAC_BENCH_BLOCKS", "3"))
    cap_default = {"bigS": 2500}.get(system, 192)
    capacity = int(os.environ.get("MANIAC_BENCH_CAPACITY", str(cap_default)))
    dtype_name = os.environ.get("MANIAC_BENCH_DTYPE", "f32")
    if dtype_name == "f64":
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32

    # persistent XLA compilation cache: first compile through the axon
    # relay costs minutes (mixed: ~9 min); repeat bench runs with an
    # unchanged program hit the disk cache instead (VERDICT r1 weak #5)
    if os.environ.get("MANIAC_BENCH_COMPILE_CACHE", "1") != "0":
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(tempfile.gettempdir(),
                                       "maniac-xla-cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from maniac_tpu import load_system
    from maniac_tpu.parallel.replicas import replicate, run_block_replicated
    from maniac_tpu.systems import (make_framework_mixed, make_triclinic_water,
                                    make_water_box, make_water_reservoir,
                                    make_zif_like)
    from maniac_tpu.utils.setupcache import cached_spec_state

    t_setup = time.perf_counter()

    # fw-split tuning knobs (deck keywords; BASELINE.md perf matrix rows
    # record the winning values): MANIAC_BENCH_FW_RCUT2 / FW_ALPHA2 /
    # EWALD_ALPHA sweep the short-range window width vs far-field grid
    # size tradeoff without a source edit
    fw_kw = {}
    for env, key in (("MANIAC_BENCH_FW_RCUT2", "fw_rcut2"),
                     ("MANIAC_BENCH_FW_ALPHA2", "fw_alpha2"),
                     ("MANIAC_BENCH_EWALD_ALPHA", "ewald_alpha")):
        if os.environ.get(env):
            fw_kw[key] = float(os.environ[env])

    def build():
        with tempfile.TemporaryDirectory() as tmp:
            res_file = None
            if system == "zif":
                make_zif_like(tmp, n_cells=6, a=5.66, n_water=32,
                              fugacity=30.0, **fw_kw)
            elif system == "mixed":
                make_framework_mixed(tmp, n_cells=6, a=5.66, n_water=24,
                                     n_dimer=12, cutoff=8.5, tol=1e-5,
                                     probs=(0.25, 0.15, 0.4, 0.2))
            elif system == "resv":
                make_water_box(tmp, n_water=48, L=24.0, cutoff=8.0, tol=1e-5,
                               probs=(0.3, 0.2, 0.5, 0.0), fugacity=4000.0)
                res_file = make_water_reservoir(tmp, n_water=96, L=24.0)
            elif system == "tricl":
                make_triclinic_water(tmp, n_water=24, L=22.0,
                                     tilt=(2.0, 1.2, 0.8), cutoff=7.0,
                                     tol=1e-5, probs=(0.3, 0.2, 0.5, 0.0),
                                     fugacity=4000.0)
            elif system == "bigS":
                make_water_box(tmp, n_water=2000, L=40.0, cutoff=8.5,
                               tol=1e-5, probs=(0.3, 0.2, 0.5, 0.0),
                               fugacity=4000.0)
            else:
                raise SystemExit(f"unknown MANIAC_BENCH_SYSTEM={system}")
            # device_put=False: the result is pickled into the setup cache;
            # committing it to the accelerator first would pull every leaf
            # back through the relay (measured 280 s for 92 MB)
            sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                               f"{tmp}/parameters.inc", dtype=dtype,
                               capacity=capacity, reservoir_file=res_file,
                               device_put=False)
        return sysm.spec, sysm.state

    # bench builder params above are part of the key (bumped on change);
    # maniac_tpu source changes invalidate via the cache's source hash
    spec, state = cached_spec_state(
        f"bench-v1|{system}|cap={capacity}|dtype={dtype_name}"
        f"|fw={sorted(fw_kw.items())}", build)
    t_build = time.perf_counter() - t_setup
    states = replicate(spec, state, replicas)
    # ONE explicit bulk transfer of the spec tables + replica batch; without
    # it every block dispatch re-streams the host-resident spec through the
    # ~400 MB/s relay tunnel alongside the compute
    spec, states = jax.device_put((spec, states), jax.local_devices()[0])
    t_setup = time.perf_counter() - t_setup
    sys.stderr.write(f"# setup split: build={t_build:.2f}s "
                     f"replicate={t_setup - t_build:.2f}s\n")

    reduce_ = jax.jit(lambda l: jnp.sum(l.reshape(-1)[:8]))

    def sync(st):
        # an on-device reduction + scalar transfer is the only reliable
        # barrier on remote backends (block_until_ready returns early
        # through the axon relay; transferring a full array would drag
        # megabytes through a ~400 MB/s tunnel into the timing)
        return float(reduce_(st.energy))

    resync = dtype_name != "f64"  # f32 runs bound amplitude drift per block

    def one_block(st):
        # resync fused into the block program: one relay dispatch per block
        return run_block_replicated(spec, st, steps_per_block, False, resync)

    # compile + warmup (excluded from timing)
    t_compile = time.perf_counter()
    states = one_block(states)
    sync(states)
    t_compile = time.perf_counter() - t_compile

    # per-phase timing: one fused block (scan + in-program resync)
    t0 = time.perf_counter()
    st2 = one_block(states)
    sync(st2)
    t_scan = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(n_blocks):
        states = one_block(states)
    sync(states)
    elapsed = time.perf_counter() - t0

    total_steps = replicas * steps_per_block * n_blocks
    rate = total_steps / elapsed

    # utilization estimate for the dominant kernel: the fused step program
    # is VPU-bound on the (F, S) pair pass (~60 vector ops/element incl.
    # erfc/exp) plus the HBM read+write of pos and amplitudes
    step_t = elapsed / (steps_per_block * n_blocks)
    F = spec.F_pack
    vpu_ops = replicas * F * spec.S * 60
    hbm_bytes = replicas * (2 * 3 * spec.S + 4 * spec.K) * 4
    sys.stderr.write(
        f"# device={jax.devices()[0]} dtype={dtype_name} replicas={replicas}"
        f" S={spec.S} K={spec.K} capacity={capacity}\n"
        f"# phases: setup={t_setup:.2f}s compile={t_compile:.2f}s "
        f"scan={t_scan / steps_per_block * 1e3:.3f}ms/step "
        f"(resync fused in-program)\n"
        f"# per-step estimates: VPU {vpu_ops / step_t / 1e12:.2f} Tops/s, "
        f"HBM {hbm_bytes / step_t / 1e9:.0f} GB/s "
        f"(floor ~{hbm_bytes / 800e9 * 1e3:.2f} ms vs {step_t * 1e3:.2f} ms)\n"
        f"# steps={total_steps:,} elapsed={elapsed:.2f}s "
        f"mean_N={float(np.asarray(states.n_mol)[:, :spec.R].sum(1).mean()):.1f}\n")
    # hardware-precision evidence (VERDICT r3 #7): the CPU suite is blind
    # to TPU DEFAULT-precision bf16 rounding, so every bench run re-proves
    # the pin + kernel parity on the device it just measured. Runs AFTER
    # timing (its own compiles must not pollute the measurement).
    hw = "skipped"
    if os.environ.get("MANIAC_BENCH_HWCHECK", "1") != "0":
        from maniac_tpu.utils.hwprobe import hw_precision_check
        t0 = time.perf_counter()
        hw, hw_detail = hw_precision_check(blocks=4)
        sys.stderr.write(f"# hw_precision={hw} ({hw_detail}) "
                         f"[{time.perf_counter() - t0:.1f}s]\n")

    metric = ("gcmc_steps_per_sec_per_chip_zif8_h2o" if system == "zif"
              else f"gcmc_steps_per_sec_per_chip_{system}")
    print(json.dumps({
        "metric": metric,
        "value": round(rate, 1),
        "unit": "MC steps/s/chip",
        "vs_baseline": round(rate / TARGET_STEPS_PER_SEC, 4),
        "hw_precision": hw,
    }))


if __name__ == "__main__":
    main()
