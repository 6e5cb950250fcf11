"""Extended loop-closure acceptance gates (VERDICT r2 weak #3).

_loop_accept adds two optional defenses against self-similar worlds on
top of the reference's fine-response gate (Mapper.cpp:1543-1546): a
fine-variance ceiling and a closure-jump cap. Defaults (inf) must be
exact reference behavior."""
import numpy as np
import pytest

from slam_toolbox_tpu.core.params import LOCALIZATION, MapperConfig
from slam_toolbox_tpu.core.scan import LaserConfig, LocalizedScan
from slam_toolbox_tpu.kernels.match import MatchResult
from slam_toolbox_tpu.mapper import Mapper


def _scan_and_graph(cfg):
    laser = LaserConfig(beam_count=61, min_angle=-1.5, max_angle=1.5,
                        min_range=0.05, max_range=10.0,
                        range_threshold=8.0)
    m = Mapper(cfg)
    m.initialize(laser.range_threshold)
    s = LocalizedScan(laser, np.full(61, 3.0), [1.0, 2.0, 0.3])
    return m.graph, s


def _fine(pose, var=0.01, response=0.9):
    return MatchResult(sensor_pose=np.asarray(pose, float),
                       covariance=np.diag([var, var, 0.01]),
                       response=response)


def test_defaults_are_reference_behavior():
    cfg = MapperConfig()
    g, s = _scan_and_graph(cfg)
    near = s.sensor_pose + [0.05, 0.02, 0.0]
    # huge variance + huge jump both pass with default (inf) gates
    assert g._loop_accept(s, _fine(near, var=99.0), cfg)
    far = s.sensor_pose + [25.0, 0.0, 0.0]
    assert g._loop_accept(s, _fine(far, var=99.0), cfg)
    # the reference fine-response gate still applies
    assert not g._loop_accept(s, _fine(near, response=0.5), cfg)


def test_fine_variance_gate():
    cfg = MapperConfig(loop_match_maximum_variance_fine=0.09)
    g, s = _scan_and_graph(cfg)
    near = s.sensor_pose + [0.05, 0.0, 0.0]
    assert g._loop_accept(s, _fine(near, var=0.05), cfg)
    assert not g._loop_accept(s, _fine(near, var=0.2), cfg)


def test_jump_gate():
    cfg = MapperConfig(loop_closure_maximum_jump=1.0)
    g, s = _scan_and_graph(cfg)
    assert g._loop_accept(s, _fine(s.sensor_pose + [0.6, 0.0, 0.0]), cfg)
    # a 2 m row-aliased correction is rejected
    assert not g._loop_accept(
        s, _fine(s.sensor_pose + [0.0, 2.0, 0.0]), cfg
    )


def test_localization_preset_enables_defenses():
    assert LOCALIZATION.loop_closure_maximum_jump == 1.0
    assert LOCALIZATION.loop_match_maximum_variance_fine < 0.1
    assert LOCALIZATION.loop_match_maximum_variance_coarse \
        == pytest.approx(0.16)
    # mapping presets keep exact reference gates
    assert MapperConfig().loop_closure_maximum_jump == float("inf")
