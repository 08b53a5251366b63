"""Multi-host GOP-parallel orchestration (SURVEY.md §2b DP row; BASELINE
config 5: "GOP-parallel across N>=2 hosts").

Closed GOPs (IDR-delimited) carry no cross-GOP prediction state, so the
host axis is pure data parallelism: each host encodes a disjoint subset
of GOPs on its local chips (optionally tile-sharded via TiledEncoder)
and host 0 concatenates the bitstreams in GOP order.  The only DCN
traffic is work assignment (static round-robin) and the final gather.

`init_distributed` wires `jax.distributed.initialize` from standard env
vars when present; on a single process everything degrades to local
execution, and `scaling_harness` simulates N hosts on one machine by
timing each host's share separately (parallel wall-clock = slowest
host), which is exact for DP with no cross-host communication.
"""

from __future__ import annotations

import os
import time

import numpy as np

from .checkpoint import gop_starts


def init_distributed() -> tuple[int, int]:
    """Initialize jax.distributed from env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); returns (num_processes, pid).

    Single-process (env unset) -> (1, 0) with no initialization."""
    import jax
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return 1, 0
    nproc = int(os.environ["JAX_NUM_PROCESSES"])
    pid = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    return nproc, pid


class GopScheduler:
    """Static round-robin assignment of closed GOPs to hosts."""

    def __init__(self, n_frames: int, intra_period: int, num_hosts: int):
        starts = gop_starts(n_frames, intra_period)
        self.bounds = starts + [n_frames]
        self.n_gops = len(starts)
        self.num_hosts = num_hosts

    def gops_for(self, host_id: int) -> list[int]:
        return [g for g in range(self.n_gops)
                if g % self.num_hosts == host_id]

    def frame_range(self, g: int) -> tuple[int, int]:
        return self.bounds[g], self.bounds[g + 1]


def encode_host_share(make_encoder, frames, sched: GopScheduler,
                      host_id: int) -> dict[int, bytes]:
    """Encode this host's GOPs; returns {gop_index: annexb_chunk}.

    One encoder instance serves all of the host's GOPs — closed GOPs
    carry no prediction state across calls, and reusing the instance
    keeps the jitted programs warm (a fresh encoder per GOP re-traces
    every program and dominates small-GOP shares).  The first chunk
    keeps SPS/PPS, later chunks drop the duplicated parameter sets so
    concatenation in GOP order is a single conforming stream."""
    out = {}
    enc = None
    for g in sched.gops_for(host_id):
        lo, hi = sched.frame_range(g)
        if enc is None:
            enc = make_encoder()
        chunk = enc.encode_sequence(frames[lo:hi])
        if g > 0:
            chunk = _strip_parameter_sets(chunk)
        out[g] = chunk
    return out


def _strip_parameter_sets(stream: bytes) -> bytes:
    from tpu264.bits import nal
    parts = []
    for ref_idc, ntype, rbsp in nal.split_annexb(stream):
        if ntype in (nal.NAL_SPS, nal.NAL_PPS):
            continue
        parts.append(nal.make_nalu(ref_idc, ntype, rbsp))
    return b"".join(parts)


def gather_streams(chunks_per_host: list[dict[int, bytes]]) -> bytes:
    """Host-0 gather: concatenate all hosts' GOP chunks in GOP order."""
    merged = {}
    for d in chunks_per_host:
        merged.update(d)
    return b"".join(merged[g] for g in sorted(merged))


def scaling_harness(make_encoder, frames, intra_period: int,
                    host_counts=(1, 2, 4), reps: int = 3) -> dict:
    """GOP-parallel scaling efficiency, simulated on one machine.

    DP has zero cross-host communication during encode, so the parallel
    wall-clock for H hosts equals the slowest host's share — measured
    here by timing each share sequentially.  Each share is timed `reps`
    times and the MEDIAN taken (single-pass timings of seconds-long
    shares reflect machine noise, not scaling — VERDICT r4 weak #4;
    superlinear "efficiency" from that noise is reported as
    raw_efficiency and clamped to 1.0 in the headline).  Efficiency =
    T(1) / (H * max_h median T_h).  BASELINE target: >=80% at 4 hosts."""
    import statistics
    results = {}
    t1 = None
    for hc in host_counts:
        sched = GopScheduler(len(frames), intra_period, hc)
        per_host = []
        per_host_reps = []
        chunks = []
        for h in range(hc):
            # steady-state measurement: each simulated host's encoder is
            # traced/warmed on its first GOP UNTIMED (a real host pays
            # that once per run, amortized over the whole sequence; here
            # the simulated shares are seconds long and the one-time
            # tracing would swamp them)
            holder = {}

            def mk_cached(holder=holder):
                if "e" not in holder:
                    holder["e"] = make_encoder()
                return holder["e"]

            g0 = sched.gops_for(h)[0]
            lo, hi = sched.frame_range(g0)
            mk_cached().encode_sequence(frames[lo:hi])
            times = []
            for _ in range(reps):
                t0 = time.monotonic()
                chunk = encode_host_share(mk_cached, frames, sched, h)
                times.append(time.monotonic() - t0)
            chunks.append(chunk)
            per_host_reps.append([round(t, 3) for t in times])
            per_host.append(statistics.median(times))
        stream = gather_streams(chunks)
        wall = max(per_host)
        if t1 is None:
            t1 = wall
        raw = t1 / (hc * wall)
        results[hc] = {
            "parallel_wall_s": round(wall, 3),
            "per_host_s": [round(t, 3) for t in per_host],
            "per_host_reps_s": per_host_reps,
            "efficiency": round(min(raw, 1.0), 3),
            "raw_efficiency": round(raw, 3),
            "stream_bytes": len(stream),
        }
    return results
