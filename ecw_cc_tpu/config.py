"""Global configuration for ecw_cc_tpu.

The reference implementation (MilaimKas/ECW_CC) is pure float64 NumPy; to match
it to 1e-8 the device kernels must run in float64 (enable via `Config.x64`).
On TPU hardware, f64 matmuls are emulated and slow; production runs use f32
(optionally with an f64 residual-correction pass, see ops/ccsd.py).
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Config:
    # Working dtype for device kernels: 'float64' for parity tests (CPU),
    # 'float32' for TPU production/bench.
    dtype: str = "float64"
    # Enable jax x64 mode at import time of ecw_cc_tpu.ops.
    x64: bool = True
    # Default DIIS settings (mirrors reference Solver_GS defaults).
    maxdiis: int = 15
    mindiis: int = 2
    # Pallas kernels on/off (falls back to XLA einsum when off or unsupported).
    use_pallas: bool = False
    # Route for the v^4 'ladder' contraction (ops/ladder.py):
    #   'dense'   — one (o^2,v^2)x(v^2,v^2) matmul (MXU-saturated, but reads
    #               the full v^4 block and does 4x redundant FLOPs),
    #   'packed'  — antisymmetry-packed triangle pairs: exact, 4x fewer
    #               FLOPs and 4x less vvvv HBM traffic, one gather+scatter
    #               of o^2 v^2/2 per call; no spin-structure requirement,
    #   'sectors' — exact spin-block decomposition (measured slower than
    #               dense on the bench chip: strided slice/scatter
    #               relayouts; kept as a tested option),
    #   'auto'    — packed at nvir >= ladder_packed_min_nvir, else dense.
    #               Crossover re-measured in r4 with the flat-GEMM engine +
    #               sectored/sym kernels (tools/crossover_r4.py, C2H2):
    #               nvir=62 (pVDZ) sorted route wins 2.15x step / 1.56x
    #               solve; nvir=30 (6-31G) mixed (1.2x step win, 0.9x
    #               solve loss) — gate placed between at 48 (was 96,
    #               measured r2 pre-flat-GEMM).
    ladder_mode: str = "auto"
    ladder_packed_min_nvir: int = 48
    # Degenerate-threshold used when dividing by orbital-energy gaps.
    # (The reference divides without protection; 0.0 reproduces that.)
    eia_shift: float = 0.0
    # Matmul precision for the DEVICE SOLVER iterations: 'highest' (6-pass
    # bf16 ~ true f32, the parity mode), 'high' (3-pass), 'default'
    # (single-pass bf16 matmuls, f32 storage), 'bf16' (single-pass AND
    # bf16-stored blocks/amplitudes in the t/lambda updates — halves the
    # HBM traffic of the bandwidth-bound soup; measured 20.1 -> 14.1
    # ms/iter at pVTZ).  Lower precisions converge to a coarser fixed
    # point; combine with SCF_device(refine=True) to recover 1e-8 parity.
    # 'hybrid' runs reduced-precision iterations (at hybrid_fast) until the
    # residual drops below hybrid_switch or stalls, then finishes with
    # 'highest' iterations — same fixed point as 'highest'.
    iter_precision: str = "highest"
    hybrid_switch: float = 1e-4
    # RETIRED (kept for API compatibility): the r2 cond(S) gate for the
    # host-f64 ERI-transform fallback.  The S^{-1/2} half of the transform
    # now always runs in f64 on the host (models/eris.build_eris_device),
    # so the f32 device build is accurate at any realistic cond(S) and no
    # fallback exists.
    eri_f32_cond_max: float = 1e5
    # Precision of the hybrid fast leg ('default' = single-pass bf16
    # matmuls, 'high' = 3-pass, 'bf16' = single-pass + bf16 storage).
    # 'high' keeps DIIS effective down to ~1e-4 residuals and wins
    # end-to-end (measured pVTZ diis='tl': 947 ms vs 976 'highest' vs 1566
    # with a 'default' fast leg whose noise defeats DIIS).
    hybrid_fast: str = "high"
    # Round-3 soup optimizations in the device solver iteration: stacked
    # t+lambda ladder GEMM (the 680 MB packed operand read once/iteration)
    # and pre-permuted loop-invariant ERI views for the hot o^3v^3 terms
    # (ops/ccsd.SoupViews).  Exact restructurings — same math, different
    # association; parity is tested either way.
    soup_opt: bool = True
    # Spin-sorted MO layout for the f32 production ERI build (alpha first
    # within occ and vir; ops/ladder.spin_sort_perm): the packed ladder
    # operand becomes block-diagonal over spin sectors (SectoredVVVV — an
    # exact further 2.67x FLOP / 2.67x HBM cut on the dominant GEMM) with
    # zero per-iteration permutation cost.  Amplitude/rdm1 boundaries stay
    # in the reference (alternating) convention (Solver_CCSD(mo_perm=...)).
    spin_sorted: bool = True
    # Sector-blocked soup kernels (ops/ccsd_sect.py) in the device solver
    # when the layout is spin-sorted AND the Vexp target/potential matrices
    # are spin-block-diagonal (checked at solver build): every o^3 v^3
    # contraction drops to ~15.6% of its dense-layout FLOPs by skipping
    # the structurally-zero spin blocks.  Exact; parity-tested.
    soup_sector: bool = True
    # Closed-shell spin-flip symmetry (ops/spinsect.py sym mode) on top of
    # the sectored kernels: mirror spin blocks are equal arrays for an
    # RHF-derived GHF with spin-restricted Vexp (checked at solver build,
    # incl. a numerical ERI flip-symmetry check), so only canonical blocks
    # are computed — a further exact ~2x FLOP cut (soup + ladder).
    soup_sym: bool = True
    # Emission scheme for the sector-blocked sub-GEMMs (r3 VERDICT next #2:
    # ~25 small-M GEMMs at M=49-98 pay MXU pipeline latency per tile pass):
    #   'sep'     — one dot per surviving spin assignment (r3 behavior)
    #   'kconcat' — contributions summed into one output block ride ONE
    #               dot with the contraction axes concatenated (3-4x fewer
    #               GEMMs; operand concat copies are ~KB-scale)
    #   'flip'    — emit the transposed orientation (stream the LARGE free
    #               dim as the MXU M) when N >= 2M
    #   'kconcat+flip' — both
    # Measured on the chip (tools/tpu_measure_r4.py, pVTZ, 41-iter
    # chains, r4 dense-tail route): sep 11.07 / kconcat 9.98 / flip 10.76
    # / kconcat+flip 9.92 ms per 'highest' iteration.  Re-measured under
    # the r5 BLOCKED route (blocked tau/ladder/update tails): sep 9.18 /
    # kconcat 7.95 / flip 8.84 / kconcat+flip 8.21 ms (solve 195.6 /
    # 167.5 / 179.2 / 171.5 ms) — with the dense assemblies gone the flip
    # orientation's extra transposes cost more than its M-streaming buys,
    # so 'kconcat' is the default.  Parity-tested all modes (exact: same
    # multiply-add sets, flat reduction order).
    soup_gemm: str = "kconcat"


_config = Config(
    dtype=os.environ.get("ECW_CC_TPU_DTYPE", "float64"),
    x64=os.environ.get("ECW_CC_TPU_X64", "1") != "0",
    use_pallas=os.environ.get("ECW_CC_TPU_PALLAS", "0") == "1",
    ladder_mode=os.environ.get("ECW_CC_TPU_LADDER", "auto"),
    iter_precision=os.environ.get("ECW_CC_TPU_ITERPREC", "highest"),
    soup_opt=os.environ.get("ECW_CC_TPU_SOUP", "1") != "0",
    spin_sorted=os.environ.get("ECW_CC_TPU_SORTED", "1") != "0",
    soup_sector=os.environ.get("ECW_CC_TPU_SOUPSECT", "1") != "0",
    soup_sym=os.environ.get("ECW_CC_TPU_SOUPSYM", "1") != "0",
    soup_gemm=os.environ.get("ECW_CC_TPU_SOUPGEMM", "kconcat"),
)


def get_config() -> Config:
    return _config


_CHOICES = {
    "dtype": ("float32", "float64"),
    "soup_gemm": ("sep", "kconcat", "flip", "kconcat+flip"),
    "ladder_mode": ("auto", "dense", "packed", "sectors"),
    "iter_precision": ("highest", "high", "default", "bf16", "hybrid"),
    "hybrid_fast": ("high", "default", "bf16"),
}


def set_config(**kwargs) -> Config:
    for k, v in kwargs.items():
        if not hasattr(_config, k):
            raise AttributeError(f"unknown config field {k!r}")
        if k in _CHOICES and v not in _CHOICES[k]:
            raise ValueError(f"config.{k} must be one of {_CHOICES[k]}, "
                             f"got {v!r}")
        setattr(_config, k, v)
    return _config


def setup_jax():
    """Apply the x64 setting to JAX. Call before building device arrays.

    Also forces full-precision f32 matmuls: the TPU default lowers f32
    dot/einsum to bf16 passes, which costs ~2 digits on chained CC
    contractions (observed: O(1) absolute errors in the MO transform).

    Enables the persistent compilation cache (remote compiles on the axon
    backend cost ~5 s each; warm runs skip them entirely).  Override the
    location with ECW_CC_TPU_JAX_CACHE; set it to '0' to disable.

    The cache lives under a per-host subdirectory keyed on the CPU feature
    set: XLA:CPU stores AOT-compiled machine code whose cache key does NOT
    include the host ISA, so an entry written on one machine can SIGILL on
    another (observed as cpu_aot_loader feature-mismatch warnings when the
    repo moves hosts).  A new host simply starts a fresh subdirectory."""
    import jax

    jax.config.update("jax_enable_x64", bool(_config.x64))
    jax.config.update("jax_default_matmul_precision", "highest")
    cache = os.environ.get(
        "ECW_CC_TPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"))
    if cache != "0":
        sub = os.path.join(cache, _host_fingerprint())
        jax.config.update("jax_compilation_cache_dir", sub)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _prune_stale_cache_dirs(cache, keep=sub)


def _prune_stale_cache_dirs(cache, keep, max_age_s=7 * 86400):
    """Delete sibling host-* cache subdirs untouched for a week.

    The fingerprint includes the boot id, so every VM boot starts a new
    subdir and the old ones (AOT code for a CPU we may never see again)
    would accumulate forever.  A week of grace avoids deleting a cache a
    concurrently-running session on another host might still be using."""
    import shutil
    import time

    try:
        entries = os.listdir(cache)
    except OSError:
        return
    now = time.time()
    for name in entries:
        path = os.path.join(cache, name)
        if path == keep or not name.startswith("host-"):
            continue
        try:
            if os.path.isdir(path) and now - os.path.getmtime(path) > max_age_s:
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            continue


def _host_fingerprint():
    """8-hex digest of the host CPU identity (+ arch + jaxlib).

    The flags list alone is NOT enough: /proc/cpuinfo is virtualized and
    may not change when the repo moves to a different physical machine
    (a real cross-machine SIGILL was observed in round 3 under flags-only
    keying), so the boot id is included as well: each VM boot gets its own
    subdir — warm within a boot/session, cold across reboots (the safe
    direction).

    Note: jaxlib 0.9.0's cpu_aot_loader prints feature-mismatch E-logs
    ("+prefer-no-scatter ... could lead to ... SIGILL") even when loading
    entries this same machine wrote moments earlier (writer/loader
    disagreement about LLVM tuning attrs, verified cold-vs-warm in round
    3); that specific warning is NOISE, not a cross-machine signal.
    """
    import hashlib
    import platform

    flags = model = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags") and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                elif line.startswith("model name") and not model:
                    model = line.split(":", 1)[1].strip()
                if flags and model:
                    break
    except OSError:
        pass
    boot = ""
    try:
        with open("/proc/sys/kernel/random/boot_id") as fh:
            boot = fh.read().strip()
    except OSError:
        pass
    try:
        import jaxlib.version
        jl = jaxlib.version.__version__
    except Exception:
        jl = ""
    digest = hashlib.sha256(
        "|".join((platform.machine(), model, flags, jl, boot)).encode()
    ).hexdigest()[:8]
    return f"host-{digest}"


def np_dtype():
    import numpy as np

    return np.dtype(_config.dtype)
