"""Multi-host (multi-process) execution scaffolding.

The reference is a single-process solver (SURVEY.md §2.9: no MPI/NCCL/
Distributed.jl anywhere in `/root/reference/src`); multi-host execution is
a new, TPU-idiomatic component.  The north-star scaling metric is
iterations/s efficiency at 2+ hosts, with the batch axis riding DCN
(between hosts) and the cone/Schur axis riding ICI (within a host/slice).

Pieces:

- ``initialize_from_env()`` / ``initialize(...)``: thin wrappers over
  ``jax.distributed.initialize`` so every entry point (bench driver, the
  launcher below, a real pod launcher) boots the multi-controller runtime
  the same way.
- ``hybrid_mesh(...)``: a (hosts, local) ``jax.sharding.Mesh`` whose first
  axis spans processes (DCN) and second axis spans each process's local
  devices (ICI).  On real TPU pods it delegates to
  ``mesh_utils.create_hybrid_device_mesh`` (topology-aware); elsewhere it
  reshapes ``jax.devices()`` (which JAX orders by process index, so rows =
  hosts holds by construction).
- ``global_put(tree, sharding)``: device_put that works identically in
  single- and multi-process runs (in multi-process runs every process must
  pass the same full host value; JAX scatters the addressable shards).
- ``allgather_to_host(tree)``: fetch a (possibly non-addressable) sharded
  pytree to replicated NumPy on every process.

Validation without TPU pods: ``hypatia_tpu.parallel.launch`` spawns N
local CPU processes (each with its own XLA host-device count), pointed at
a 127.0.0.1 coordinator — the JAX-native analog of a gloo ring — and
``tests/test_multihost.py`` asserts a 2-process batched solve matches the
single-process solve exactly.
"""

import os

import numpy as np


def initialize(coordinator_address, num_processes, process_id,
               platform=None):
    """Boot the JAX multi-controller runtime for this process.

    Must run before any other JAX API touches the backend.  ``platform``
    overrides the backend (e.g. "cpu" for local validation runs; the
    session environment pins an accelerator platform via JAX_PLATFORMS,
    and sitecustomize may have pre-imported jax, so the live config is
    updated too).
    """
    import jax

    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )
    return jax


def initialize_from_env():
    """Initialize from HYPATIA_MH_* env vars (set by the local launcher or
    a pod launch script).  No-op when the vars are absent (single process).

    Env contract:
      HYPATIA_MH_COORD     host:port of process 0's coordinator
      HYPATIA_MH_NPROCS    total process count
      HYPATIA_MH_PROC_ID   this process's index
      HYPATIA_MH_PLATFORM  optional backend override (e.g. "cpu")
      HYPATIA_MH_LOCAL_DEVICES  optional per-process CPU device count
                           (applied via XLA_FLAGS before backend init)
    """
    coord = os.environ.get("HYPATIA_MH_COORD")
    if not coord:
        return None
    ndev = os.environ.get("HYPATIA_MH_LOCAL_DEVICES")
    if ndev:
        import re

        # replace (not just append) any inherited device-count flag: the
        # launcher's parent may itself run under a virtual-device config
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={ndev}"
        ).strip()
    return initialize(
        coord,
        os.environ["HYPATIA_MH_NPROCS"],
        os.environ["HYPATIA_MH_PROC_ID"],
        platform=os.environ.get("HYPATIA_MH_PLATFORM"),
    )


def hybrid_mesh(dcn_axis="hosts", ici_axis="devices"):
    """A (hosts, local_devices) mesh: axis 0 spans processes (DCN), axis 1
    spans each process's local devices (ICI).

    Shard the instance batch over ``dcn_axis`` (pure data parallel, no
    per-iteration collectives cross host) and the cone/Schur axis over
    ``ici_axis`` (the psum of the Schur assembly rides ICI) — the layout
    SURVEY.md §2.9 prescribes so collectives ride ICI, not DCN.
    """
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    nproc = jax.process_count()
    local = len(devs) // nproc
    if jax.default_backend() == "tpu" and nproc > 1:
        try:
            from jax.experimental import mesh_utils

            arr = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, local), dcn_mesh_shape=(nproc, 1),
                devices=devs)
            return Mesh(arr, axis_names=(dcn_axis, ici_axis))
        except Exception:
            pass  # fall through to the generic reshape
    # jax.devices() is ordered by process index -> rows are hosts
    arr = np.array(devs).reshape(nproc, local)
    return Mesh(arr, axis_names=(dcn_axis, ici_axis))


def global_put(tree, sharding):
    """device_put a host pytree onto a (possibly multi-process) sharding.

    Every process must call this with the SAME full host values (models are
    built deterministically on each controller); JAX transfers only the
    addressable shards of each process.
    """
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def allgather_to_host(tree):
    """Gather a sharded pytree to replicated NumPy on every process.

    Single-process: plain device_get.  Multi-process: non-addressable
    shards cannot be fetched directly, so route through
    ``multihost_utils.process_allgather`` (tiled: concatenate shards along
    their sharded axis, i.e. reassemble the global array).
    """
    import jax

    if jax.process_count() == 1:
        # device_get prefetches every leaf asynchronously before blocking:
        # ONE round trip over the tunneled link instead of a synchronous
        # per-leaf fetch (measured ~1.1 s of per-leaf round trips at nb=32)
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)
