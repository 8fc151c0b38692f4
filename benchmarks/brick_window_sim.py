"""Estimate processed-chunk counts: z-sort single arc vs (z-slab, y) brick
sort with <=3 arcs, using the exact bbox chunk-skip predicate."""
import numpy as np

def bbox_flags(pos_s, tc, box, cutoff):
    """(n_blocks, n_chunks) conservative process flags (same math as
    _chunk_skip_bitmap, valid atoms only)."""
    n = pos_s.shape[0]
    nb, nc = n // tc, n // 128
    pb = pos_s[: nb * tc].reshape(nb, tc, 3)
    cb = (pb.min(1) + pb.max(1)) / 2
    hb = (pb.max(1) - pb.min(1)) / 2
    pc = pos_s[: nc * 128].reshape(nc, 128, 3)
    cc = (pc.min(1) + pc.max(1)) / 2
    hc = (pc.max(1) - pc.min(1)) / 2
    dd = cb[:, None, :] - cc[None, :, :]
    dd -= box * np.round(dd / box)
    gap = np.maximum(np.abs(dd) - hb[:, None, :] - hc[None, :, :], 0.0)
    return (gap**2).sum(-1) <= cutoff**2 * (1 + 1e-5)

def arcs_needed(flags_row):
    """number of circular runs of 1s."""
    f = flags_row.astype(int)
    if f.all() or not f.any():
        return 1 if f.any() else 0
    transitions = np.sum((f == 1) & (np.roll(f, 1) == 0))
    return transitions

def window_cost(flags, max_arcs):
    """processed chunks per block if we cover flags with <= max_arcs circular
    runs (fallback: full width)."""
    nb, nc = flags.shape
    total = 0
    fallback = 0
    for b in range(nb):
        k = arcs_needed(flags[b])
        if k == 0:
            continue
        if k <= max_arcs:
            total += flags[b].sum()
        else:
            # merge runs greedily: cover with max_arcs arcs = sum of runs +
            # smallest gaps merged. Approximate with exact minimal cover:
            f = flags[b].astype(int)
            idx = np.where(f)[0]
            # circular: compute gaps between consecutive 1-runs
            runs = []
            start = None
            for i in range(nc):
                if f[i] and (start is None):
                    start = i
                if not f[i] and start is not None:
                    runs.append((start, i - 1)); start = None
            if start is not None:
                if runs and runs[0][0] == 0 and f[-1]:
                    runs[0] = (start, runs[0][1] + nc)  # wrap merge
                else:
                    runs.append((start, nc - 1))
            if len(runs) <= max_arcs:
                total += f.sum(); continue
            # gaps between consecutive runs (circular)
            gaps = []
            for i in range(len(runs)):
                nxt = runs[(i + 1) % len(runs)]
                g = (nxt[0] - runs[i][1] - 1) % nc
                gaps.append(g)
            # keep the max_arcs largest gaps open; merge the rest
            gaps_sorted = sorted(gaps, reverse=True)
            merged_cost = f.sum() + sum(gaps) - sum(gaps_sorted[:max_arcs])
            total += min(merged_cost, nc)
    return total / nb

rng = np.random.default_rng(0)
for n_atoms, box, cutoff in [(10240, 40.0, 3.6), (10240, 40.0, 5.5), (65536, 74.3, 3.6)]:
    pos = rng.uniform(0, box, (n_atoms, 3))
    nc = n_atoms // 128
    # --- plain z sort
    pz = pos[np.argsort(pos[:, 2])]
    # --- brick: z-slab (width >= cutoff, integral number of slabs) then y
    n_slabs = max(1, int(box // cutoff))
    sw = box / n_slabs
    slab = np.minimum((pos[:, 2] // sw).astype(int), n_slabs - 1)
    order = np.lexsort((pos[:, 1], slab))
    pb = pos[order]
    for tc in (8, 16, 32):
        fz = bbox_flags(pz, tc, box, cutoff)
        fb = bbox_flags(pb, tc, box, cutoff)
        z1 = window_cost(fz, 1)
        b3 = window_cost(fb, 3)
        b4 = window_cost(fb, 4)
        arcs = [arcs_needed(fb[b]) for b in range(fb.shape[0])]
        print(
            f"N={n_atoms} cutoff={cutoff} tc={tc}: z-sort 1-arc {z1:.1f} ch/blk"
            f" | brick <=3 arcs {b3:.1f} | <=4 {b4:.1f}"
            f" | ideal {fb.sum(1).mean():.1f} | arc-count p95 {np.percentile(arcs,95):.0f}"
            f" | total chunks {nc}"
        )
