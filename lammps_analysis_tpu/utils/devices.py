"""Compute-placement policy for bandwidth-bound stages.

Transformations and windowed-correlation calculators are
bandwidth-bound: they stream gigabytes through O(bytes) arithmetic.
Whether they belong on the accelerator depends entirely on the
host->device link: on a TPU host with local PCIe/ICI (GB/s) the device
wins; behind a slow link (this environment tunnels the chip at ~30 MB/s)
shipping the trajectory costs 30x the compute and the host CPU wins.

The policy is measured, not assumed: the first call times one 8 MB
``device_put`` and caches the bandwidth. Compute-dense kernels
(RDF/ADF/SDF histograms: thousands of flops per byte) always stay on the
accelerator; only stages with O(1) flops/byte consult this policy.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

log = logging.getLogger(__name__)

#: below this measured host->device bandwidth (MB/s), bandwidth-bound
#: stages run on the host CPU backend. Local PCIe/ICI measures in GB/s;
#: remote tunnels in tens of MB/s — the two regimes are far apart.
SLOW_LINK_MBPS = 200.0

#: if the 2 MB probe has not completed within this deadline the link is
#: classified slow immediately (a wedged remote tunnel once blocked the
#: probe for 18 MINUTES; any link that cannot move 4 MB in this time is
#: far below SLOW_LINK_MBPS anyway, so the early answer is exact)
PROBE_DEADLINE_S = 10.0

_measured_mbps: Optional[float] = None


def device_transfer_bandwidth_mbps() -> float:
    """Measured host->default-device transfer bandwidth (cached).

    The probe runs in a daemon thread with a deadline: a blocked or
    pathologically slow link reports its (tiny) upper-bound bandwidth
    after ``PROBE_DEADLINE_S`` instead of stalling the analysis — the
    thread is left to drain in the background.
    """
    global _measured_mbps
    if _measured_mbps is not None:
        return _measured_mbps
    import threading

    import jax
    import numpy as np

    if jax.default_backend() == "cpu":
        _measured_mbps = float("inf")
        return _measured_mbps
    x = np.zeros((512 * 1024,), dtype=np.float32)  # 2 MB
    dev = jax.devices()[0]
    # ROUND-TRIP measurement: remote backends can ack an async device_put
    # from a host-side buffer long before bytes cross the link (this
    # machine's tunnel reports GB/s on put-only but ~30 MB/s for real
    # traffic) — only a fetch forces the wire
    done = threading.Event()
    result: list = []

    def probe():
        try:
            np.asarray(jax.device_put(x, dev))  # warm the path
            t0 = time.perf_counter()
            np.asarray(jax.device_put(x, dev))
            result.append(2 * 2.0 / max(time.perf_counter() - t0, 1e-9))
        except Exception as err:  # pragma: no cover - backend specific
            log.warning("bandwidth probe failed: %s", err)
            result.append(0.0)
        done.set()

    t_start = time.perf_counter()
    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(PROBE_DEADLINE_S):
        # can't move 4 MB within the deadline: bound the bandwidth from
        # above — certainly a slow link
        _measured_mbps = 4.0 / (time.perf_counter() - t_start)
        log.warning(
            "host->%s bandwidth probe exceeded %.0f s deadline; "
            "classifying the link as slow (<= %.1f MB/s)",
            jax.default_backend(), PROBE_DEADLINE_S, _measured_mbps,
        )
        return _measured_mbps
    _measured_mbps = result[0]
    log.info(
        "host->%s transfer bandwidth: %.0f MB/s",
        jax.default_backend(), _measured_mbps,
    )
    return _measured_mbps


def bandwidth_bound_device():
    """Device for O(1)-flops/byte stages: host CPU behind a slow link,
    else None (follow the default placement)."""
    import jax

    if jax.default_backend() == "cpu":
        return None
    if device_transfer_bandwidth_mbps() >= SLOW_LINK_MBPS:
        return None
    return jax.local_devices(backend="cpu")[0]


@contextlib.contextmanager
def bandwidth_bound_compute():
    """Scope under which bandwidth-bound jax work runs per the policy."""
    import jax

    dev = bandwidth_bound_device()
    if dev is None:
        yield None
    else:
        with jax.default_device(dev):
            yield dev


def reset_measurement() -> None:
    """Test hook: forget the cached bandwidth measurement."""
    global _measured_mbps
    _measured_mbps = None
