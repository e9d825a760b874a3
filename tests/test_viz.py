"""Smoke tests for the visual spot-check tooling (pose_tpu/tools/viz.py —
reference datasets.py:157-183, data_groups.py:330-375,
depth_datasets.py:295-309, filter_ntu_samples.py:151-160). Headless Agg
backend; assertions check that the expected artists land on the axes."""

import os

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np
import pytest

from pose_tpu.tools import viz


@pytest.fixture(autouse=True)
def _close_figures(monkeypatch):
    monkeypatch.setattr(plt, 'show', lambda: None)
    yield
    plt.close('all')


def _camera(res=(64, 48)):
    from pose_tpu.geometry.camera import Camera
    intr = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]])
    return Camera(intrinsic_matrix=intr, world_up=(0, -1, 0))


def test_show_mat_draws_joints_edges_and_bbox():
    fig, ax = plt.subplots()
    coords = np.random.RandomState(0).rand(17, 2) * 50
    viz.show_mat(coords, ax, bbox=[2, 3, 20, 30], skeleton='h36m')
    # 1 joint scatter + 17 edge lines; one rectangle patch
    assert len(ax.lines) == 1 + 17
    assert len(ax.patches) == 1


def test_show_mat_cmu_skeleton_size():
    fig, ax = plt.subplots()
    coords = np.zeros((19, 2))
    viz.show_mat(coords, ax, skeleton='cmu')
    assert len(ax.lines) == 1 + 19


def test_show_skeleton_confidence_gating():
    rng = np.random.RandomState(1)
    image = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    coords = rng.rand(2, 19) * 40
    confidence = np.ones(19)
    confidence[3] = 0.0    # below the 0.1 gate: joint and its edges dropped
    viz.show_skeleton(image, coords, confidence, message='test',
                      bbox=[1, 1, 10, 10], skeleton='cmu')
    ax = plt.gcf().axes[0]
    assert ax.get_title().startswith('test:')
    assert len(ax.images) == 1
    assert len(ax.patches) == 1
    # scatter + mean marker + one line per edge whose both ends are valid
    n_edge_lines = len(ax.lines) - 2
    assert 0 < n_edge_lines < 19


def test_visualize_depth_overlay(tmp_path):
    depth_png = str(tmp_path / 'depth.png')
    img = (np.random.RandomState(2).rand(48, 64) * 255).astype(np.uint8)
    plt.imsave(depth_png, img, cmap='gray')
    cam = _camera()
    pose = np.random.RandomState(3).rand(17, 3) * 100 + [0, 0, 2000]
    viz.visualize(depth_png, cam, pose, pose + 5.0, [4, 4, 30, 30])
    fig = plt.gcf()
    assert len(fig.axes) == 2
    for ax in fig.axes:
        assert len(ax.images) == 1
        assert len(ax.lines) == 1 + 17


def test_visualize_filtered_multiple_skeletons():
    cam = _camera()
    image = np.zeros((48, 64, 3), np.uint8)
    skels = [np.random.RandomState(s).rand(17, 3) * 200 + [0, 0, 3000]
             for s in range(3)]
    viz.visualize_filtered(image, skels, cam)
    ax = plt.gcf().axes[0]
    assert len(ax.lines) == 3 * (1 + 17)
