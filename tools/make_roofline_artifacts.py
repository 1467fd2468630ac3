#!/usr/bin/env python
"""Regenerate ROOFLINE_AGENTS.json and GRU_ROOFLINE.json (roofline v2).

Inputs:
  * VPU_CALIBRATION.json — measured issue/MXU ceilings from
    tools/vpu_calibrate.py (run on hardware first).
  * MEASURED — hardware throughputs: the per-config rollout rates from
    PERF_TABLE.json (round-4 sweep) and the GRU sequence-kernel per-pass
    times from tools/gru_update_probe.py at B=16,384 (stage K = fwd,
    KB - K = bwd; measured 2026-08-20, /tmp/r5/queue4.log, committed in
    BASELINE.md).

Runs entirely on CPU — only jaxprs are counted; the measured numbers are
pinned here so the artifacts are reproducible without re-running the
hardware probes.

Usage: python tools/make_roofline_artifacts.py
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.roofline import agent_sweep, gru_roofline

# per-config Pallas rollout rates (PERF_TABLE.json round-4 sweep, T=128)
MEASURED_ROLLOUT = {
    "rware-tiny-2ag-v2": 1474320077,
    "rware-tiny-4ag-v2": 894274585,
    "rware-small-4ag-v2": 438072884,
    "rware-medium-6ag-v2": 175503134,
    "rware-large-8ag-v2": 93771706,
    "rware-tiny-12ag-v2": 160144173,
    "rware-tiny-16ag-v2": 98647348,
    "rware-large-19ag-v2": 32647799,
}

# GRU sequence-kernel per-pass ms at B=16,384 minibatch shapes
# (tools/gru_update_probe.py stages: K = obs-fwd alone; KB - K = bwd)
MEASURED_GRU_FWD_MS = 2.767
MEASURED_GRU_BWD_MS = 8.557 - 2.767


def main():
    with open(os.path.join(REPO, "VPU_CALIBRATION.json")) as f:
        cal = json.load(f)
    agent_sweep(
        out_path=os.path.join(REPO, "ROOFLINE_AGENTS.json"),
        measured=MEASURED_ROLLOUT,
    )
    gru_roofline(
        out_path=os.path.join(REPO, "GRU_ROOFLINE.json"),
        measured_fwd_ms=MEASURED_GRU_FWD_MS,
        measured_bwd_ms=MEASURED_GRU_BWD_MS,
        calibration={
            "envmix": cal["ceiling_envmix_slots_per_s"],
            "gru_dot": cal["rate_gru_dot_flops_per_s"],
            "big_dot": cal["rate_big_dot_flops_per_s"],
            "dw_dot": cal["rate_dw_dot_flops_per_s"],
            # per-cell DMA orchestration floor measured by the kernel
            # bisect (ops/pallas_gru.py:18-22)
            "dma_per_cell_s": 13e-6,
        },
    )


if __name__ == "__main__":
    main()
