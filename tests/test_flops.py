"""Pin the hand-derived flagship FLOP model (mde_tpu/utils/flops.py).

The bench's MFU and baseline ratios are derived from FLOP counts; this pin
keeps the independent hand count stable so accounting drift (compiler- or
estimate-side) is loud. The compiled ``cost_analysis`` count measured
1.8755 TFLOP/img on v5e (BENCH_r03) — the hand model must stay within 15%
of that anchor (it lands ~7% above: cost_analysis excludes the Pallas
attention custom-call dots and counts some fusions differently).
"""

from mde_tpu.utils.flops import flagship_forward_flops

COST_ANALYSIS_ANCHOR = 1.8755e12  # BENCH_r03.json, unrolled head


def test_flagship_flops_pin():
    f = flagship_forward_flops(352, 704)
    assert abs(f - 2.0107e12) / 2.0107e12 < 1e-3
    assert abs(f - COST_ANALYSIS_ANCHOR) / COST_ANALYSIS_ANCHOR < 0.15


def test_flops_scale_with_resolution_and_encoder():
    small = flagship_forward_flops(352, 704)
    wide = flagship_forward_flops(352, 1216)   # KITTI test -> 448x1536
    nyu = flagship_forward_flops(480, 640)     # NYU -> 448x672
    assert wide > small > nyu
    large = flagship_forward_flops(352, 704, encoder_type="large")
    assert large > small


def test_flops_neck_variants_run():
    base = flagship_forward_flops(352, 704, neck_type="red33")
    for neck in ("red", "fpn", "segformer", "red33r", "red33res"):
        v = flagship_forward_flops(352, 704, neck_type=neck)
        assert v > 0
        # all necks are within 2x of each other at flagship dims
        assert 0.5 < v / base < 2.0
