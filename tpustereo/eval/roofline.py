"""Ops/bytes roofline model for the SGM pipeline (SURVEY.md §6, §5.1;
VERDICT r2 missing #1): quantifies what resource bounds the measured
fps/chip instead of asserting an asymptote.

The model counts VPU *element-ops* (one elementwise operation applied to
one (pixel, disparity) cell) straight from the Pallas kernels' per-step op
sequences (`kernels.sgm_pallas._sweep_kernel` / `_bwd_wta_kernel`), on the
PADDED slab geometry the kernels actually execute. Counts are exact for
the op *sequence* as written (each jnp op in the kernel body = 1 element-op
per cell); what Mosaic finally schedules can differ by fusions/copies, so
utilization figures carry a ~±15 % modeling band — they answer "which
resource binds and roughly how hard", not a 3-digit MFU.

Two issue models bracket the truth, because cross-lane ops (pltpu.roll —
the renorm tree is built from them) are not documented to issue on all 4
VPU ALUs like pure elementwise ops:

* `uniform`  — every element-op retires at 4 lanes-slots/cycle (8x128x4
  ALUs): the optimistic VPU ceiling.
* `roll_penalized` — cross-lane ops cost ROLL_PENALTY x an elementwise
  op. r29b measured 2.75x from single-length dependent chains; r43b's
  two-length differenced re-measurement showed that reading was ~all
  harness floor (~2.4 ms/iteration regardless of op count) and rolls are
  in fact NO more expensive than int32 elementwise ops — so the default
  penalty is now 1.0 and the two ceilings coincide (the knob and record
  field are kept for comparability with older records).

The measured point landing near the ceiling ⇒ VPU-issue-bound;
far below ⇒ something else (DMA, dependencies, overhead) binds.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from tpustereo.config import Config


# ---------------------------------------------------------------------------
# chip specs
# ---------------------------------------------------------------------------

# Per-chip peaks. VPU: sublanes x lanes x ALUs x clock = element-ops/s.
# v5 lite ("v5e") figures per the public scaling-book tables: 8x128 vregs,
# 4 ALUs, ~0.94 GHz, HBM ~819 GB/s. The dev chip reports device_kind
# containing "v5 lite"/"v5e"; unknown kinds fall back to v5e so the record
# always names its assumption.
CHIPS: Dict[str, Dict[str, float]] = {
    "v5e": dict(vpu_elem_ops_per_s=8 * 128 * 4 * 0.94e9,   # 3.85e12
                vreg_elems=8 * 128,
                clock_hz=0.94e9,
                hbm_bytes_per_s=819e9),
    "v5p": dict(vpu_elem_ops_per_s=8 * 128 * 4 * 2 * 1.75e9,  # 2 cores
                vreg_elems=8 * 128,
                clock_hz=1.75e9,
                hbm_bytes_per_s=2765e9),
}


# Measured cross-lane (roll) vs elementwise op cost on the dev chip.
# HISTORY: r29b read 2.75x from dependent-chain probes at a single chain
# length — r43b re-measured with TWO chain lengths differenced (the
# ~2.4 ms/iteration harness floor cancels) and found the r29b reading was
# ~all floor: marginal costs on a (1248, 128) slab are int32 ALU
# 338 ns/op (includes a VMEM re-read per op), roll 89 ns/op — rolls are
# NOT more expensive than elementwise int32 ops (ratio bounded <= 1), so
# the penalized ceiling collapses onto the uniform one. Kept as a knob
# with the corrected value 1.0; scripts/tpu_r43b_results.json holds the
# marginals.
ROLL_PENALTY = 1.0


def chip_spec(device_kind: str) -> Tuple[str, Dict[str, float]]:
    k = (device_kind or "").lower()
    if "v5p" in k or "v5 p" in k:
        return "v5p", CHIPS["v5p"]
    return "v5e", CHIPS["v5e"]


# ---------------------------------------------------------------------------
# per-cell op counts (derived line-by-line from kernels/sgm_pallas.py)
# ---------------------------------------------------------------------------

# _sweep_kernel, per direction per scan step, per (N, D) slab element:
#   axial (dx=0): up/dn neighbour (roll+cmp+select)x2 = 6, bracket mins +
#   P1/P2 = 4, L = c + cand = 1, renorm roll-tree = 7 rolls + 7 mins = 14,
#   carry subtract = 1, S accumulate = 1  -> 27 ops (9 cross-lane).
#   diagonal adds the dx sublane roll + 2 iota cmps + or + select = 5
#   (1 more cross-lane) -> 32 ops (10 cross-lane).
SWEEP_AXIAL_OPS, SWEEP_AXIAL_ROLLS = 27, 9
SWEEP_DIAG_OPS, SWEEP_DIAG_ROLLS = 32, 10

# _bwd_wta_kernel per scan step per element, beyond the axial SGM step it
# embeds: S finalize + clamp 2, pack 2, packed roll-tree 14, best/d decode
# 2, uniqueness (MXU path) 7 VPU ops, subpixel (MXU path) rolls+selects+
# decode ~10, incremental right-WTA min/roll/select 4 -> ~41 extra
# (17 extra cross-lane: packed tree 7 + A/B/right rolls 3 + carry tree 7).
BWD_EXTRA_OPS, BWD_EXTRA_ROLLS = 41, 17

# --- SWAR (2x16 halves-packed) issue-true counts (VERDICT r3 next #4) ---
# Counted from `_swar_sgm_step`/`_dir_step_swar` exactly the way the v32
# sequence was, then divided by 2 (one packed element = two cells):
# per direction per PACKED element: up/dn neighbour (roll+cmp+select)x2
# = 6; bracket = 3 SWAR mins (13 ops each: no packed vector min exists)
# + P1 add = 40; L = cp + cand = 1; renorm tree = 7 x (roll + 13-op SWAR
# min) = 98; carry subtract = 1 -> 146 packed-ops = 73.0 ops/cell
# (9 packed cross-lane = 4.5/cell). Diagonals add the sublane roll + seam
# fixup + per-field OOB masking: ~17 packed-ops = 8.5/cell (+0.5/cell
# cross-lane). Pack/mask/unpack/S-accumulate cost ~12 packed-ops per scan
# step shared across the fused directions -> ~6 ops/cell once per sweep.
#
# NOTE the honest reading (BASELINE.md roofline): the as-written SWAR
# sequence carries ~2.7x the ALU ops/cell of the v32 sequence on half
# the vregs (net ~1.35x element-op work), yet MEASURES faster (r29c
# micro 0.93x, in-context +15%). Utilization computed under this
# accounting therefore OVERSTATES hardware efficiency wherever Mosaic's
# lowering compresses the bit-twiddling (field-mask selects, shift/or
# chains) — it brackets the truth from above, the work-normalized v32
# accounting brackets it from below. Both ride every bench record.
SWEEP_AXIAL_OPS_SWAR, SWEEP_AXIAL_ROLLS_SWAR = 73.0, 4.5
SWEEP_DIAG_OPS_SWAR, SWEEP_DIAG_ROLLS_SWAR = 81.5, 5.0
SWAR_STEP_OVERHEAD_OPS = 6.0
# bwd kernel: the embedded recurrence packs (73 ops/cell), the WTA stages
# run per unpacked row half (S*256+lane needs 19 bits) -> same per-cell
# cost as the v32 WTA extras.
BWD_EXTRA_OPS_SWAR, BWD_EXTRA_ROLLS_SWAR = 41, 17

# --- bf16 (native bfloat16 sweeps, SWEEP_BF16 — adopted r43d) ---
# Counted from `_dir_step_bf16` per PACKED element (2 cells per 32-bit
# lane), /2 for per-cell: q bit view 1; up/dn neighbours (roll on the
# int32 view + bitcast + iota cmp + select) 4+4; bracket (3 bf16 mins +
# P1 add — ONE op each, the whole point) 4; L = c + cand 1; renorm tree
# 7 x (bf16 min + bitcast-roll-bitcast) = 28; carry subtract 1;
# L -> int32 convert + S accumulate 2 -> 45 packed = 22.5 ops/cell
# (9 packed cross-lane = 4.5/cell). Diagonals add the one-row shift on
# the bit view (bitcast + sublane roll + 2 shifts + and + or + bitcast
# = 7) + fresh-start mask (2 cmps + select) -> 10 packed = 5.0/cell
# (+0.5/cell cross-lane). Shared per scan step: c widen/convert +
# padded-lane mask + out cast + S_in add ~ 6 packed ops.
# The as-written bf16 sequence has FEWER ops/cell than even the
# work-normalized v32 one — the adoption direction the SWAR-true
# accounting pointed at (BASELINE round-4: headroom is algorithmic).
SWEEP_AXIAL_OPS_BF16, SWEEP_AXIAL_ROLLS_BF16 = 22.5, 4.5
SWEEP_DIAG_OPS_BF16, SWEEP_DIAG_ROLLS_BF16 = 27.5, 5.0
BF16_STEP_OVERHEAD_OPS = 6.0

# census_cost_volume_pallas: per (y, x, d) cell ~3 ops (xor + native
# popcount + widen/accumulate; 2 planes for >32-bit censuses), plus the
# per-PIXEL census construction (~2 ops per window bit: cmp + pack-or).
COST_CELL_OPS = 3
CENSUS_PIXEL_OPS_PER_BIT = 2


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _impl_row(impl: str):
    if impl == "swar":
        return (SWEEP_AXIAL_OPS_SWAR, SWEEP_AXIAL_ROLLS_SWAR,
                SWEEP_DIAG_OPS_SWAR, SWEEP_DIAG_ROLLS_SWAR,
                SWAR_STEP_OVERHEAD_OPS)
    if impl == "bf16":
        return (SWEEP_AXIAL_OPS_BF16, SWEEP_AXIAL_ROLLS_BF16,
                SWEEP_DIAG_OPS_BF16, SWEEP_DIAG_ROLLS_BF16,
                BF16_STEP_OVERHEAD_OPS)
    return (SWEEP_AXIAL_OPS, SWEEP_AXIAL_ROLLS,
            SWEEP_DIAG_OPS, SWEEP_DIAG_ROLLS, 0.0)


def resolve_impl(cfg: Config, shape: Optional[Tuple[int, int]] = None,
                 frames: Optional[int] = None) -> Tuple[str, str]:
    """(sweep_impl, bwd_impl) the dispatch would pick for cfg at HEAD
    toggles — mirrors the gates in kernels.sgm_pallas (sweeps and the
    bwd+WTA kernel's embedded recurrence are toggled independently).

    adaptive_p2 configs carry p2_maps, which the SWAR sweep gate and BOTH
    bwd packed gates exclude (sweeps then ride bf16 or v32; the bwd
    recurrence always v32). The horizontal-layout kernels (fwd sweep +
    bwd) additionally need their sublane count F*round_up(H, 8) % 16 == 0
    for any packed impl — pass `shape` (and `frames`, default
    cfg.frames_per_step) to model that; without a shape the resolver
    assumes aligned (the vertical sweeps' N is a multiple of 128 either
    way). The returned sweep impl names the VERTICAL sweeps; the fwd
    horizontal sweep drops to v32 when the alignment fails
    (`sgm_ops_model` accounts for it via the same check)."""
    from tpustereo.kernels import sgm_pallas as sp
    bf_ok = (cfg.max_census_cost + cfg.p2 <= 255
             and cfg.num_disparities <= 256)  # r44 VMEM bound
    swar_ok = cfg.p1 + cfg.p2 + 256 < sp._BIG16
    # the SWEEP SWAR gate excludes p2_maps outright; the bwd packed gates
    # admit adaptive maps through the lane-major layout (r53)
    adaptive_bwd_ok = not cfg.adaptive_p2 or sp.P2_LANE_MAJOR
    aligned = True
    if shape is not None:
        F = cfg.frames_per_step if frames is None else frames
        aligned = (F * _round_up(shape[0], 8)) % 16 == 0
    sweep = ("bf16" if (sp.SWEEP_BF16 and bf_ok) else
             "swar" if (sp.SWEEP_SWAR and swar_ok
                        and not cfg.adaptive_p2) else "v32")
    bwd = ("bf16" if (sp.BWD_BF16 and bf_ok and adaptive_bwd_ok
                      and aligned) else
           "swar" if (sp.SWEEP_SWAR and swar_ok and adaptive_bwd_ok
                      and aligned) else "v32")
    return sweep, bwd


def sad_ops_model(cfg: Config, shape: Tuple[int, int]) -> Optional[dict]:
    """Per-frame element-op / HBM-byte model for the fused plane-sweep SAD
    kernel (kernels/sad_pallas.py), counted from its per-plane op sequence
    on the padded (band, Wq) slab geometry: pass 1 = incremental roll +
    |diff| + fill mask + right-edge rebuild (2r) + separable binary box
    sums (~2*(ceil(log2 b)+popcount_bits(b)) roll+add each axis) + packed
    WTA min (+3 right-WTA ops when the LR check is on); pass 2 (when
    uniqueness/subpixel need it) recomputes the plane and adds the
    exclusion min + two capture selects. HBM is just images in + 4 maps
    out — the volume never exists."""
    if cfg.mode != "sad":
        return None
    H, W = shape
    D = cfg.num_disparities
    b = cfg.sad_block
    r = b // 2
    with_dr = cfg.disp12_max_diff >= 0
    band = _round_up(H + b - 1, 8)
    Wq = _round_up(max(W + 2 * r, (W + D - 1) if with_dr else 0), 128)
    cells = band * Wq
    win = 2 * ((b.bit_length() - 1) + bin(b).count("1"))  # per axis
    plane = 1 + 2 + 2 + 2 * r + 2 * win   # roll+diff+mask+edge+box sums
    p1_ops = plane + 3 + (3 if with_dr else 0)      # + pack/min (+ A ops)
    two_pass = cfg.uniqueness_ratio > 0 or cfg.subpixel
    p2_ops = (plane + 2 + 2 + 6) if two_pass else 0  # d* + m2 + captures
    total = cells * D * (p1_ops + p2_ops)
    hbm = 2 * cells * 4 + 4 * cells * 4              # images in, maps out
    return {
        "shape": [H, W], "padded": [band, Wq], "planes": D,
        "elem_ops_total": total,
        "cross_lane_ops_total": cells * D * (1 + win + (1 if with_dr else 0)
                                             + (win if two_pass else 0)),
        "hbm_bytes_total": hbm,
    }


def sgm_ops_model(cfg: Config, shape: Tuple[int, int],
                  swar: Optional[bool] = None,
                  impl: Optional[Tuple[str, str]] = None) -> Optional[dict]:
    """Per-FRAME element-op and HBM-byte totals for the fused Pallas SGM
    pipeline at `shape`, on the padded geometry the kernels execute.
    Returns None for non-SGM modes (no model).

    impl: (sweep_impl, bwd_impl) op-sequence selection, each of
    'v32' | 'swar' | 'bf16' (None = what the toggles would dispatch,
    `resolve_impl`) — the issue-true accounting VERDICT r3 #4 asked for.
    swar: legacy bool alias (True = ('swar','swar'), False =
    ('v32','v32'), the work-normalized accounting)."""
    if cfg.mode != "sgm":
        return None
    H, W = shape
    fwd_impl = None
    if impl is None:
        if swar is not None:
            impl = ("swar", "swar") if swar else ("v32", "v32")
        else:
            impl = resolve_impl(cfg, shape)
            # the fwd horizontal sweep shares the bwd kernel's sublane
            # alignment gate; when it fails, only that sweep drops to v32
            # (the vertical sweeps' N is always 128-aligned)
            if (cfg.frames_per_step * _round_up(H, 8)) % 16:
                fwd_impl = "v32"
    sweep_impl, bwd_impl = impl
    if fwd_impl is None:
        fwd_impl = sweep_impl
    D = cfg.num_disparities
    Hp, Wq, Dp = _round_up(H, 8), _round_up(W, 128), _round_up(D, 128)
    cells = Hp * Wq * Dp  # one slab volume (identical transposed)

    ax_ops, ax_rolls, dg_ops, dg_rolls, step_ovh = _impl_row(sweep_impl)
    fx_ops, fx_rolls, _, _, fx_ovh = _impl_row(fwd_impl)
    bx_ops, bx_rolls, _, _, bx_ovh = _impl_row(bwd_impl)
    # the WTA stages run at full width in every impl (the packed-argmin
    # needs 19+ bits) — same extras regardless
    bwd_ops, bwd_rolls = BWD_EXTRA_OPS, BWD_EXTRA_ROLLS

    n_diag = 2 if cfg.paths == 8 else 0
    # vertical sweeps: down + up, each (1 axial + n_diag diagonals)
    v_ops = 2 * (ax_ops + n_diag * dg_ops + step_ovh)
    v_rolls = 2 * (ax_rolls + n_diag * dg_rolls)
    # horizontal: forward sweep (axial, fwd impl — sweep impl unless the
    # sublane alignment gate demotes it) + fused bwd+WTA (its embedded
    # recurrence follows the bwd impl)
    h_ops = (fx_ops + fx_ovh) + (bx_ops + bx_ovh + bwd_ops)
    h_rolls = fx_rolls + (bx_rolls + bwd_rolls)

    census_ops = 2 * Hp * Wq * cfg.census_bits * CENSUS_PIXEL_OPS_PER_BIT
    ops = {
        "cost": cells * COST_CELL_OPS + census_ops,
        "vertical_sweeps": cells * v_ops,
        "horizontal_sweeps": cells * h_ops,
    }
    rolls = {
        "cost": 0,
        "vertical_sweeps": cells * v_rolls,
        "horizontal_sweeps": cells * h_rolls,
    }

    # HBM traffic (bytes): C int8 + fused Ct int8 written by the cost
    # kernel; the down sweep reads C and writes S int16; the up sweep reads
    # C + S and writes S (aliased); the standalone S transpose (the shipped
    # EMIT_TRANSPOSED=False path) reads+writes S; the fwd sweep reads
    # Ct + St and writes St; bwd+WTA reads Ct + St and writes the small
    # (N, W) packed maps (negligible).
    c_bytes, s_bytes = cells, 2 * cells
    hbm = {
        "cost_write": 2 * c_bytes,
        "down_sweep": c_bytes + s_bytes,
        "up_sweep": c_bytes + 2 * s_bytes,
        "s_transpose": 2 * s_bytes,
        "fwd_sweep": c_bytes + 2 * s_bytes,
        "bwd_wta": c_bytes + s_bytes,
    }

    path_cells = H * W * D * cfg.paths  # the judge-facing canonical count
    impl_rec = {"sweeps": sweep_impl, "bwd": bwd_impl}
    if fwd_impl != sweep_impl:
        impl_rec["fwd"] = fwd_impl
    return {
        "shape": [H, W], "padded": [Hp, Wq, Dp], "paths": cfg.paths,
        "impl": impl_rec,
        "path_cell_updates": path_cells,
        "elem_ops": ops,
        "elem_ops_total": sum(ops.values()),
        "cross_lane_ops": rolls,
        "cross_lane_ops_total": sum(rolls.values()),
        "hbm_bytes": hbm,
        "hbm_bytes_total": sum(hbm.values()),
    }


def roofline(cfg: Config, shape: Tuple[int, int], sec_per_frame: float,
             device_kind: str = "", core_sec_per_frame: Optional[float] = None
             ) -> Optional[dict]:
    """Utilization record: achieved element-op and HBM rates vs the chip
    ceilings, under both issue models. core_sec_per_frame (the differenced
    cost+sweeps+WTA time from `production_stage_times`) attributes the
    model to the kernels it describes; whole-frame time includes postproc
    the model does not cover (sorts/CC), so core utilization is the honest
    figure when available.

    The record carries BOTH accountings (VERDICT r3 #4): `*_aswritten`
    counts the op sequence the toggles actually dispatch (SWAR packed
    bit-ops or the bf16 bitcast-roll sequence — `model_aswritten.impl`
    names it), while the default keys keep the work-normalized v32
    sequence (same cell updates in canonical vector ops)."""
    if sec_per_frame <= 0:
        return None
    if cfg.mode == "sad":
        ms = sad_ops_model(cfg, shape)
        name, spec = chip_spec(device_kind)
        achieved = ms["elem_ops_total"] / sec_per_frame
        return {
            "chip_assumed": name,
            "vpu_peak_elem_gops": round(spec["vpu_elem_ops_per_s"] / 1e9, 1),
            "hbm_peak_gbps": round(spec["hbm_bytes_per_s"] / 1e9, 1),
            "model": {k: ms[k] for k in ("elem_ops_total",
                                         "cross_lane_ops_total",
                                         "hbm_bytes_total", "padded",
                                         "planes")},
            "hbm_gbps_achieved": round(ms["hbm_bytes_total"]
                                       / sec_per_frame / 1e9, 2),
            "hbm_util": round(ms["hbm_bytes_total"] / sec_per_frame
                              / spec["hbm_bytes_per_s"], 4),
            "frame": {
                "achieved_elem_ops_per_s": round(achieved / 1e9, 1),
                "vpu_util_uniform": round(
                    achieved / spec["vpu_elem_ops_per_s"], 4),
            },
            "bound": "VPU",  # the volume never exists; maps are tiny
        }
    m = sgm_ops_model(cfg, shape, swar=False)   # work-normalized
    if m is None:
        return None
    m_asw = sgm_ops_model(cfg, shape)           # toggle-dispatched
    if m_asw is not None and m_asw["impl"] == m["impl"]:
        m_asw = None                            # v32 everywhere: one model
    name, spec = chip_spec(device_kind)
    peak_ops = spec["vpu_elem_ops_per_s"]
    vreg = spec["vreg_elems"]

    def util(sec, mm):
        ops = mm["elem_ops_total"]
        rolls = mm["cross_lane_ops_total"]
        achieved = ops / sec
        # roll-penalized ceiling: measured penalty (r29b probe; see module
        # docstring) in ALU-slot units, elementwise at 4 vregs/cycle
        eq_ops = (ops - rolls) + ROLL_PENALTY * rolls
        cycles_ideal = eq_ops / vreg / 4 / spec["clock_hz"]
        return {
            "achieved_elem_ops_per_s": round(achieved / 1e9, 1),  # G ops/s
            "vpu_util_uniform": round(achieved / peak_ops, 4),
            "vpu_util_roll_penalized": round(cycles_ideal / sec, 4),
            "roll_penalty_assumed": ROLL_PENALTY,
        }

    rec = {
        "chip_assumed": name,
        "vpu_peak_elem_gops": round(peak_ops / 1e9, 1),
        "hbm_peak_gbps": round(spec["hbm_bytes_per_s"] / 1e9, 1),
        "model": {k: m[k] for k in ("path_cell_updates", "elem_ops_total",
                                    "cross_lane_ops_total",
                                    "hbm_bytes_total", "padded")},
        "hbm_gbps_achieved": round(m["hbm_bytes_total"] / sec_per_frame / 1e9, 2),
        "hbm_util": round(m["hbm_bytes_total"] / sec_per_frame
                          / spec["hbm_bytes_per_s"], 4),
        "frame": util(sec_per_frame, m),
    }
    if m_asw is not None:
        rec["model_aswritten"] = {
            "impl": m_asw["impl"],
            **{k: m_asw[k] for k in ("elem_ops_total",
                                     "cross_lane_ops_total")}}
        rec["frame_aswritten"] = util(sec_per_frame, m_asw)
    if core_sec_per_frame and core_sec_per_frame > 0:
        rec["core"] = util(core_sec_per_frame, m)
        if m_asw is not None:
            rec["core_aswritten"] = util(core_sec_per_frame, m_asw)
    # classify over the SAME window (whole frame) for both resources —
    # mixing core-window VPU with frame-window HBM would bias toward VPU
    u = rec["frame"]
    rec["bound"] = ("VPU" if u["vpu_util_uniform"] > 3 * rec["hbm_util"]
                    else "HBM" if rec["hbm_util"] > 3 * u["vpu_util_uniform"]
                    else "mixed")
    return rec


# ---------------------------------------------------------------------------
# profiler-derived device busy fraction (best effort)
# ---------------------------------------------------------------------------

def device_busy_fraction(trace_dir: str) -> Optional[dict]:
    """Parse a jax.profiler trace dir (plugins/profile/*/ *.xplane.pb) and
    return the device-plane busy fraction: Σ(top-level event durations on
    TPU/device lines) / trace span. Best effort — returns None when the
    trace or the tensorflow xplane tooling is unavailable (the tunnelled
    dev chip does not always deliver device traces)."""
    import glob
    import os
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None
    try:
        from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa: F401
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except Exception:
        try:
            from tensorboard_plugin_profile.protobuf import xplane_pb2
        except Exception:
            return None
    try:
        with open(sorted(paths)[-1], "rb") as f:
            space = xplane_pb2.XSpace.FromString(f.read())
    except Exception:
        return None
    out = {}
    for plane in space.planes:
        nm = plane.name.lower()
        if not ("tpu" in nm or "device" in nm or "accelerator" in nm):
            continue
        # events on one line tile that line's busy time; lines are nested
        # views of the same timeline, so the busiest single line (usually
        # "XLA Ops") is the device busy estimate — summing across lines
        # would multi-count
        t0, t1 = None, None
        per_line = {}
        for line in plane.lines:
            busy = 0
            for ev in line.events:
                s = line.timestamp_ns + ev.offset_ps // 1000
                e = s + ev.duration_ps // 1000
                busy += ev.duration_ps // 1000
                t0 = s if t0 is None else min(t0, s)
                t1 = e if t1 is None else max(t1, e)
            if busy:
                per_line[line.name or str(line.id)] = busy
        if t0 is not None and t1 > t0 and per_line:
            frac = max(per_line.values()) / (t1 - t0)
            out[plane.name] = round(min(frac, 1.0), 4)
    return out or None
