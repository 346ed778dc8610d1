"""Beyond-one-chip proof for the Kronecker grid family (VERDICT round-3
item 4): AOT-compile the sharded GridGP / masked-grid NLL+grad at sizes
whose single-chip footprint exceeds a v5e's 16 GB HBM, on the 8-device
mesh, and record the per-device memory of the compiled executable — the
same artifact the dense stack produced at N=51200 (6.6 GB/device,
__graft_entry__.py section 4c).

The observation tensor is passed as an abstract sharded argument (the
location residualization is one elementwise op and does not change the
memory profile; gradients flow through the per-axis grams, the eigh
bases, and every N-cell intermediate of the analytic eigh-free backward
— exactly the buffers that dominate).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python benchmarks/grid_aot_memory.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def _force_cpu_mesh(n=8):
    import os
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    return jax


def _mem_line(tag, compiled, wall):
    mem = compiled.memory_analysis()
    temp = (getattr(mem, "temp_size_in_bytes", 0) or 0)
    arg = (getattr(mem, "argument_size_in_bytes", 0) or 0)
    out = (getattr(mem, "output_size_in_bytes", 0) or 0)
    print(f"{tag}: temp {temp/1e9:.2f} GB/device, args {arg/1e9:.2f} GB, "
          f"out {out/1e6:.1f} MB (compile {wall:.1f}s)", flush=True)
    return temp


def complete_grid(jax, shape, n_dev):
    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import g3py_tpu as g3
    from g3py_tpu.ops.kron import kron_gp_nll

    axes = [np.linspace(0, 8, s).astype(np.float32) for s in shape]
    kernels = [g3.MAT52(axes[0][:, None], name=f"K{i}")
               for i in range(1)] + [
        g3.SE(axes[i][:, None], name=f"K{i}") for i in range(1, len(shape))]
    # observe a small row subset purely to initialize hyper defaults —
    # the AOT objective below takes the full residual tensor abstractly.
    # Passing that subset as ``space=`` matters: without it GridGP's
    # __init__ materializes the FULL N-row coordinate matrix on the host
    # (6.4 GB at N=537M — measured as the dominant cost of the round-4
    # dryrun 4l timeout, ~260 s on a 1-core box; VERDICT r4 item 1).
    rng = np.random.default_rng(0)
    flat = rng.choice(int(np.prod(shape)), 2048, replace=False)
    sub_idx = np.unravel_index(flat, shape)
    rows = np.stack([axes[i][sub_idx[i]] for i in range(len(shape))],
                    1).astype(np.float32)
    grgp = g3.GridGP(axes=axes, kernel=kernels, space=rows, name="AOTG")
    grgp.observed(rows, np.sin(rows[:, 0]).astype(np.float32))
    reg = grgp.active
    u0 = jnp.asarray(reg.dict_to_array(grgp.params_default))

    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("dp",))
    ax_i = int(np.argmax(shape))
    spec = [None] * len(shape)
    spec[ax_i] = "dp"
    sharding = NamedSharding(mesh, P(*spec))

    shard = (mesh, "dp") if n_dev > 1 else None

    def obj(u, yt):
        p = reg.array_to_dict_jax(u)
        yt = lax.with_sharding_constraint(yt, sharding)
        return kron_gp_nll(grgp._grams(p), grgp._noise_var(p), yt,
                           shard=shard)

    vg = jax.jit(jax.value_and_grad(obj))
    yt_abs = jax.ShapeDtypeStruct(tuple(shape), np.float32,
                                  sharding=sharding)
    t0 = time.perf_counter()
    compiled = vg.lower(u0, yt_abs).compile()
    return _mem_line(
        f"complete {'x'.join(map(str, shape))} (N={np.prod(shape):,}) "
        f"on {n_dev} dev", compiled, time.perf_counter() - t0)


def masked_grid(jax, shape, frac, n_dev, rank=64, cg_iters=100, probes=8,
                lanczos=25):
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import g3py_tpu as g3
    from g3py_tpu.ops.kron import masked_kron_nll

    axes = [np.linspace(0, 8, s).astype(np.float32) for s in shape]
    kernels = [g3.MAT52(axes[0][:, None], name="K0"),
               g3.SE(axes[1][:, None], name="K1")]
    grgp = g3.GridGP(axes=axes, kernel=kernels, name="AOTM")
    rng = np.random.default_rng(0)
    flat = rng.choice(int(np.prod(shape)), 2048, replace=False)
    sub_idx = np.unravel_index(flat, shape)
    rows = np.stack([axes[i][sub_idx[i]] for i in range(len(shape))],
                    1).astype(np.float32)
    grgp.observed(rows, np.sin(rows[:, 0]).astype(np.float32))
    reg = grgp.active
    u0 = jnp.asarray(reg.dict_to_array(grgp.params_default))

    n_obs = int(frac * np.prod(shape))
    n_obs -= n_obs % n_dev
    devs = np.array(jax.devices()[:n_dev])
    mesh = Mesh(devs, ("dp",))
    sh_y = NamedSharding(mesh, P("dp"))
    sh_i = NamedSharding(mesh, P(None, "dp"))

    def obj(u, yres, idx):
        p = reg.array_to_dict_jax(u)
        nll, info = masked_kron_nll(grgp._grams(p), grgp._noise_var(p),
                                    yres, idx, tuple(shape), rank,
                                    cg_iters, probes, lanczos, 0)
        return nll

    vg = jax.jit(jax.value_and_grad(obj))
    y_abs = jax.ShapeDtypeStruct((n_obs,), np.float32, sharding=sh_y)
    i_abs = jax.ShapeDtypeStruct((len(shape), n_obs), np.int32,
                                 sharding=sh_i)
    t0 = time.perf_counter()
    compiled = vg.lower(u0, y_abs, i_abs).compile()
    return _mem_line(
        f"masked {'x'.join(map(str, shape))} {frac:.0%} obs "
        f"(n_obs={n_obs:,}) on {n_dev} dev", compiled,
        time.perf_counter() - t0)


def main():
    jax = _force_cpu_mesh(8)
    print("devices:", len(jax.devices()), flush=True)

    # calibration: the VERDICT's suggested 512x512x16 on one device
    t1 = complete_grid(jax, (512, 512, 16), 1)
    # scale the complete grid until the single-chip temp exceeds 15 GB,
    # then show the 8-device partition of the same program
    for shape in [(1024, 1024, 64), (2048, 2048, 128)]:
        t_single = complete_grid(jax, shape, 1)
        if t_single > 15e9:
            t_shard = complete_grid(jax, shape, 8)
            print(f"--> single-chip {t_single/1e9:.1f} GB > 15 GB HBM; "
                  f"8-device {t_shard/1e9:.2f} GB/device "
                  f"({t_single/max(t_shard,1):.1f}x partition)", flush=True)
            break

    # masked raster: 1024^2 at 50% observed, single vs 8 devices
    m1 = masked_grid(jax, (1024, 1024), 0.5, 1)
    m8 = masked_grid(jax, (1024, 1024), 0.5, 8)
    print(f"masked partition ratio: {m1/max(m8,1):.1f}x", flush=True)


if __name__ == "__main__":
    main()
