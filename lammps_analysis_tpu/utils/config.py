"""Global configuration singleton.

TPU-first analog of the reference config (``mdsuite/utils/config.py:30-59``).
Instead of a host-RAM ``memory_fraction`` only, this config also carries the
device-memory budget used by the static batch planner, the compute dtype for
device kernels, and jupyter/plot toggles.
"""

from __future__ import annotations

import contextlib
import dataclasses


@dataclasses.dataclass
class Config:
    """Global runtime configuration.

    Attributes
    ----------
    jupyter : bool
        Whether we are running inside a notebook (affects progress bars only).
    memory_fraction : float
        Fraction of the (host or device) memory budget the batch planner may
        plan into. Same default as the reference (0.5).
    device_memory_fraction : float
        Fraction of per-device HBM the planner may fill with trajectory data.
    compute_dtype : str
        Default dtype for device kernels of *structural* calculators
        ("float32" on TPU; dynamic calculators use float64 on CPU backends
        for parity with the reference's tf.float64 path).
    accumulate_dtype : str
        Dtype used for long-running accumulations (histograms, ACF sums).
    interactive_plots : bool
        If False, plots are written to files only.
    fuse_streaming : bool
        If True, calculators that stream ``Unwrapped_Positions`` unwrap
        the wrapped positions ON THE FLY (carry chained across slabs)
        when the unwrapped dataset is not materialised — skipping one
        full-trajectory write AND read. Results are identical to the
        materialised path (the unwrap math is batch-size invariant);
        the trade is that no ``Unwrapped_Positions`` dataset is left
        behind for later reuse. Off by default (reference semantics).
    progress_bars : bool | None
        Progress bars on ingestion/transformation/streaming loops
        (reference parity: tqdm on every loop). ``None`` (default) means
        auto — on only when stderr is a TTY or ``jupyter`` is set, so
        tests, benchmarks, and driver runs stay clean.
    native_cpu_kernels : bool
        On a CPU-only backend, route hot host kernels (currently the RDF
        pair histogram) to the native C++ AVX implementations in
        ``native/`` when the toolchain can build them (~14x the jitted
        XLA-CPU route). Semantics match XLA up to f32 rounding at bin
        edges; set False for bit-identical XLA behavior.
    """

    jupyter: bool = False
    memory_fraction: float = 0.5
    device_memory_fraction: float = 0.6
    compute_dtype: str = "float32"
    accumulate_dtype: str = "float64"
    interactive_plots: bool = False
    fuse_streaming: bool = False
    progress_bars: bool | None = None
    native_cpu_kernels: bool = True


config = Config()


def _host_fingerprint() -> str:
    """Short hash identifying this host's CPU (model + feature flags).

    XLA's persistent cache stores AOT-compiled executables whose codegen
    is specialised to the compile machine's CPU features. Loading them on
    a different host is at best pessimised (XLA warns about mismatched
    machine features and measured ~4x slower on the unwrap scan after
    this VM migrated hosts) and at worst SIGILLs — so the cache directory
    is keyed by the host CPU identity.

    The model-name + flags lines alone are NOT enough: cloud VMs report a
    generic model name ("Intel(R) Xeon(R) Processor @ 2.10GHz") and
    near-identical flag sets across CPU generations, while LLVM derives
    extra tuning features (e.g. ``+prefer-no-gather``) from the cpuid
    family/model/stepping — a second migration collided on the old key
    and served mis-targeted AOT code again. Key on the full identity
    block: vendor, family, model, stepping, microcode, name, flags.
    """
    import hashlib
    import platform

    keys = (
        "vendor_id", "cpu family", "model", "model name", "stepping",
        "microcode", "flags", "Features", "CPU implementer", "CPU part",
    )
    ident = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break  # one processor block identifies the host
                if line.split(":")[0].strip() in keys:
                    ident.append(line.strip())
    except OSError:  # pragma: no cover - non-Linux
        ident.append(platform.processor())
    return hashlib.sha1("|".join(ident).encode()).hexdigest()[:12]


def enable_persistent_compile_cache() -> None:
    """Point JAX at an on-disk compilation cache (idempotent).

    XLA-CPU compiles of the streaming kernels cost seconds (measured ~10 s
    for the unwrapper's scan on a 1 GB slab) and dominate short analyses;
    the persistent cache makes every later process pay ~0 instead. TPU
    backends usually have their own server-side cache — the directory cache
    is still harmless there. Opt out with ``LATPU_JAX_CACHE=0``; override
    the BASE location with ``LATPU_JAX_CACHE=/path`` (a ``host-<cpu hash>``
    subdirectory is always appended: cached executables embed
    machine-specific codegen and must never be shared across hosts).
    """
    import os

    env = os.environ.get("LATPU_JAX_CACHE", "")
    if env == "0":
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # user already configured one
    base = env or os.path.join(
        os.path.expanduser("~"), ".cache", "lammps_analysis_tpu", "xla"
    )
    path = os.path.join(base, f"host-{_host_fingerprint()}")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is an optimisation only
        pass


@contextlib.contextmanager
def change_memory_fraction(desired_memory: float):
    """Temporarily override ``config.memory_fraction``.

    Test hook mirroring ``mdsuite/utils/helpers.py:60-120`` — integration tests
    shrink the memory budget to force the mini-batched code paths.
    """
    old = config.memory_fraction
    config.memory_fraction = desired_memory
    try:
        yield config
    finally:
        config.memory_fraction = old
