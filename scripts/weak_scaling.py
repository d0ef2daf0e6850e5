"""Weak-scaling measurement of the sharded pipelines (VERDICT r2 item 6).

For n in {1, 2, 4, 8} virtual CPU devices, evaluate
``parallel.sharded_infidelity`` with a FIXED per-device frequency shard
(n_omega = 4096 * n) and ``parallel.sharded_error_transfer_matrix``
with a fixed per-device pulse batch (batch = 4 * n): under weak
scaling, per-device work is constant, so ideal scaling is flat wall
time as devices grow.  The only collective in the infidelity pipeline
is the single frequency-integral psum
(tests/test_parallel.py::test_weak_scaling_collectives_and_parity
pins exactly-one-all-reduce in the compiled HLO); the batched ETM has
none.

Virtual CPU devices share the host's cores, so flat time additionally
requires the host to have >= n idle cores; the collective-count test
is the architecture guarantee, this script is the measurement.

Run: python scripts/weak_scaling.py            (spawns one subprocess
                                                per device count)
     python scripts/weak_scaling.py --single N (one measurement)
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path


def measure(n_devices: int) -> dict:
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', n_devices)
    jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(Path(__file__).parent.parent))
    sys.path.insert(0, str(Path(__file__).parent.parent / 'tests'))
    from testutil import rand_pulse_sequence

    from filter_functions_tpu import functional, parallel

    pulse = rand_pulse_sequence(2, 8, 2, 2)
    p = functional.make_pulse_arrays(pulse)
    mesh = parallel.make_mesh(n_devices)

    # --- infidelity: fixed 4096-frequency shard per device ---
    omega = jnp.linspace(0.5, 10, 4096 * n_devices)
    spectrum = 1e-2 / omega

    def run_infid():
        return np.asarray(parallel.sharded_infidelity(p, spectrum,
                                                      omega, mesh))
    run_infid()
    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        run_infid()
    t_infid = (time.perf_counter() - t0) / reps * 1e3

    # --- batched ETM: fixed 4-pulse shard per device ---
    batch = 4 * n_devices
    mesh_b = parallel.make_mesh(n_devices, batch=n_devices)
    scales = 1.0 + 0.01 * np.arange(batch)
    pb = functional.PulseArrays(
        p.c_opers, jnp.asarray(scales[:, None, None] * p.c_coeffs),
        p.n_opers, jnp.broadcast_to(p.n_coeffs,
                                    (batch,) + p.n_coeffs.shape),
        jnp.broadcast_to(p.dt, (batch,) + p.dt.shape), p.basis)
    omega_e = np.geomspace(0.1, 10, 128)
    spectrum_e = 1e-3 / omega_e

    def run_etm():
        return np.asarray(parallel.sharded_error_transfer_matrix(
            pb, spectrum_e, omega_e, pulse.basis, mesh_b,
            second_order=True))
    run_etm()
    t0 = time.perf_counter()
    for _ in range(5):
        run_etm()
    t_etm = (time.perf_counter() - t0) / 5 * 1e3

    return dict(n_devices=n_devices, infidelity_ms=round(t_infid, 2),
                infidelity_n_omega=4096 * n_devices,
                etm_ms=round(t_etm, 2), etm_batch=batch)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--single', type=int, default=None)
    args = parser.parse_args()
    if args.single:
        print(json.dumps(measure(args.single)))
        return
    rows = []
    for n in (1, 2, 4, 8):
        out = subprocess.run(
            [sys.executable, __file__, '--single', str(n)],
            capture_output=True, text=True, timeout=1200)
        if out.returncode:
            print(out.stderr, file=sys.stderr)
            raise SystemExit(1)
        rows.append(json.loads(out.stdout.strip().splitlines()[-1]))
    print(f"{'devices':>8} {'n_omega':>8} {'infid ms':>9} "
          f"{'etm batch':>9} {'etm ms':>8}")
    for r in rows:
        print(f"{r['n_devices']:>8} {r['infidelity_n_omega']:>8} "
              f"{r['infidelity_ms']:>9.2f} {r['etm_batch']:>9} "
              f"{r['etm_ms']:>8.2f}")
    base = rows[0]
    worst_i = max(r['infidelity_ms'] / base['infidelity_ms']
                  for r in rows)
    worst_e = max(r['etm_ms'] / base['etm_ms'] for r in rows)
    print(f"worst-case weak-scaling inflation: infidelity "
          f"{worst_i:.2f}x, etm {worst_e:.2f}x (1.0 = ideal flat)")


if __name__ == '__main__':
    main()
