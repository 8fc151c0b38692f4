"""Roofline / MFU decomposition for the Pallas RDF and ADF kernels.

VERDICT r2 item 4: the headline numbers (RDF ~10 Gpairs/s, ADF ~9-12
ms/frame at 10240 atoms) had no accounting of how far from the chip's
ceiling they sit. This script derives the per-pair / per-element
instruction counts FROM THE KERNELS' OWN PARAMETERS (the id-split, tile
and window sizes the production code picks at the headline shapes),
combines them with the v5e's public peak rates, and reports the binding
resource and the fraction of its roofline each measured rate achieves.

Peak-rate model (TPU v5e, single chip, public numbers):
  * MXU: 197 TFLOP/s bf16  ->  98.5e12 MAC/s
  * derived TensorCore clock: 197e12 / (2 * 4 MXUs * 128 * 128) = 1.50 GHz
  * VPU: (8 sublanes x 128 lanes) x 4 ALUs x clock = 6.1e12 f32 op/s
    (the VPU shape/ALU count follows the public scaling-book model; it
    is the largest uncertainty here, so utilisations are reported
    against this single stated assumption)
  * HBM: 819 GB/s

Measured inputs come from the committed healthy-chip artifacts
(`rebaseline.json` probe 0.5 s, `BENCH_r02.json` probe 0.52 s,
`adf_stage_split.json`); re-run `benchmarks/rebaseline.py` on a healthy
chip to refresh them.

Output: one JSON dict (also summarised in bench.py extras as
``rdf_vpu_roofline_frac``).
"""

import json
import pathlib

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent

# ----------------------------------------------------------- v5e peak model
MXU_MAC_S = 98.5e12  # 197 TFLOP/s bf16 / 2
CLOCK_HZ = 1.50e9  # derived from the MXU peak
VPU_OPS_S = 8 * 128 * 4 * CLOCK_HZ  # 6.1e12 f32 elementwise op/s
HBM_B_S = 819e9


def _round_up(x, m):
    return -(-x // m) * m


def rdf_model(n_atoms=10240, n_bins=500, n_species=2):
    """Per-pair cost of ops/pallas_rdf.py at the headline shape."""
    n_pairs = n_species * (n_species + 1) // 2
    total = n_pairs * n_bins
    # the kernel's near-square id split (pallas_rdf.py:96-112): k is the
    # measured-optimal 16-multiple near sqrt(total) (48 at 1500 bins)
    k = min(128, _round_up(int(np.ceil(np.sqrt(total))), 16))
    n_hi = -(-total // k)
    hi_pad = _round_up(n_hi, 8)

    # VPU f32 elementwise ops per enumerated (i < j) pair:
    geometry = 3 + 15 + 6  # subtract, min-image (5/dim), d = sqrt(sum sq)
    ids = 3 + 3 + 2  # species pair id, bin, combined
    mask = 7  # 4 compares + 3 ands
    split = 2 + 2 + 1  # hi = floor(c/k), lo = c - hi*k, mask fold
    onehot = (hi_pad + k) * 2  # compare + select per one-hot row
    vpu_per_pair = geometry + ids + mask + split + onehot

    mxu_mac_per_pair = hi_pad * k  # (HI, P) x (LO, P) contraction

    # HBM per pair is negligible: positions stream once per frame while
    # every atom pairs with N-1 others
    hbm_bytes_per_pair = (2 * 12) / max(n_atoms - 1, 1)

    return {
        "shape": {"n_atoms": n_atoms, "n_bins": n_bins,
                  "n_species": n_species, "k_lo": k, "hi_pad": hi_pad},
        "vpu_ops_per_pair": vpu_per_pair,
        "vpu_ops_onehot_share": onehot / vpu_per_pair,
        "mxu_mac_per_pair": mxu_mac_per_pair,
        "hbm_bytes_per_pair": hbm_bytes_per_pair,
        "ceiling_pairs_s": {
            "vpu": VPU_OPS_S / vpu_per_pair,
            "mxu": MXU_MAC_S / mxu_mac_per_pair,
            "hbm": HBM_B_S / hbm_bytes_per_pair,
        },
    }


def adf_stage2_model(
    n_atoms=10240, n_bins=500, n_species=2, box=40.0, cutoff=3.6,
    k_n=128, pack=2,
):
    """Per-element cost of the folded Pallas ADF angle stage.

    Stage-2 processes, per packed center row, ``sub/2`` roll offsets
    across ``K`` lanes; elements beyond each center's realised neighbor
    count are masked waste (the extraction-efficiency factor below).
    """
    n_triples = n_species * (n_species + 1) * (n_species + 2) // 6
    total = n_triples * n_bins
    k_lo = min(128, _round_up(int(np.ceil(np.sqrt(2.0 * total))), 32))
    n_hi = -(-total // k_lo)
    hi_pad = _round_up(n_hi, 8)

    sub = k_n // pack
    n_off = sub // 2
    rows_per_frame = n_atoms / pack
    elements_per_frame = rows_per_frame * n_off * k_n

    rho = n_atoms / box**3
    mean_nb = rho * 4.0 / 3.0 * np.pi * cutoff**3
    true_pairs_per_frame = n_atoms * mean_nb * (mean_nb - 1) / 2
    efficiency = true_pairs_per_frame / elements_per_frame

    geometry = 5 + 4 + 2  # gram dot, cos normalise, clip
    acos = 25  # musl polynomial (mul/add/sqrt/select)
    weight = 5  # 1/(d_j d_k)^4 via squarings
    ids_masks = 14
    onehot = (k_lo + 2 * hi_pad) * 2  # hi rows duplicated for 2 bf16 halves
    vpu_per_element = geometry + acos + weight + ids_masks + onehot
    mxu_mac_per_element = (2 * hi_pad) * k_lo

    return {
        "shape": {"n_atoms": n_atoms, "n_bins": n_bins, "k_n": k_n,
                  "pack": pack, "k_lo": k_lo, "hi_pad": hi_pad},
        "elements_per_frame": elements_per_frame,
        "mean_neighbors": mean_nb,
        "extraction_efficiency": efficiency,
        "vpu_ops_per_element": vpu_per_element,
        "vpu_ops_onehot_share": onehot / vpu_per_element,
        "mxu_mac_per_element": mxu_mac_per_element,
        "ceiling_ms_per_frame": {
            "vpu": elements_per_frame * vpu_per_element / VPU_OPS_S * 1e3,
            "mxu": elements_per_frame * mxu_mac_per_element / MXU_MAC_S * 1e3,
        },
    }


def main():
    rdf = rdf_model()
    adf = adf_stage2_model()

    measured = {}
    reb = HERE / "rebaseline.json"
    if reb.exists():
        r = json.loads(reb.read_text())
        measured = {
            "rdf_pairs_per_s": r.get("rdf_pairs_per_s"),
            # key renamed in r5 (adf_firstshell_key); old artifacts
            # carried the f16 workload under adf_ms_per_frame_f16
            "adf_firstshell_ms_per_frame_f16": r.get(
                "adf_firstshell_ms_per_frame_f16",
                r.get("adf_ms_per_frame_f16"),
            ),
            "probe_s": r.get("probe_s"),
            "measured": r.get("measured"),
        }
    split = HERE / "adf_stage_split.json"
    stage2_ms = None
    if split.exists():
        s = json.loads(split.read_text())
        stage2_ms = s.get("10k_f16", {}).get(
            "stage2_plus_overhead_ms_per_frame"
        )

    out = {"v5e_peaks": {"mxu_mac_s": MXU_MAC_S, "vpu_ops_s": VPU_OPS_S,
                         "hbm_b_s": HBM_B_S, "clock_hz": CLOCK_HZ},
           "rdf": rdf, "adf_stage2": adf, "measured": measured}

    if measured.get("rdf_pairs_per_s"):
        r = measured["rdf_pairs_per_s"]
        out["rdf"]["binding_resource"] = "vpu"
        out["rdf"]["fraction_of_vpu_roofline"] = (
            r / rdf["ceiling_pairs_s"]["vpu"]
        )
        out["rdf"]["fraction_of_mxu_roofline"] = (
            r / rdf["ceiling_pairs_s"]["mxu"]
        )
    if stage2_ms:
        out["adf_stage2"]["measured_stage2_ms_per_frame"] = stage2_ms
        out["adf_stage2"]["binding_resource"] = "vpu"
        out["adf_stage2"]["fraction_of_vpu_roofline"] = (
            adf["ceiling_ms_per_frame"]["vpu"] / stage2_ms
        )
    print(json.dumps(out, indent=1, default=float))
    (HERE / "roofline.json").write_text(
        json.dumps(out, indent=1, default=float)
    )


if __name__ == "__main__":
    main()
