"""Visual spot-check tooling (SURVEY.md §4): skeleton/bbox overlays for 2D
coords, 3D world poses and predicted-vs-GT depth views (reference: show_mat
datasets.py:157-183, show_skeleton data_groups.py:330-375 /
back_project.py:39-84, visualize depth_datasets.py:295-309)."""

import numpy as np


def _edges(short_names, parent):
    mapper = dict(zip(short_names, range(len(short_names))))
    body_edges = [mapper[parent[name]] for name in short_names]
    return np.hstack([
        np.arange(len(body_edges)).reshape(-1, 1),
        np.array(body_edges).reshape(-1, 1)])


def show_mat(image_coord, ax, bbox=None, skeleton='h36m'):
    """Plot a 2D skeleton onto an axes (datasets.py:157-183)."""
    import matplotlib.patches as patches

    import joint_settings
    short_names = getattr(joint_settings, skeleton + '_short_names')
    parent = getattr(joint_settings, skeleton + '_parent')
    body_edges = _edges(short_names, parent)

    ax.plot(image_coord[:, 0], image_coord[:, 1], '.', color='yellow')
    for edge in body_edges:
        ax.plot(image_coord[edge, 0], image_coord[edge, 1], '--', color='b')
    if bbox is not None:
        rect = patches.Rectangle((bbox[0], bbox[1]), bbox[2], bbox[3],
                                 linewidth=2, edgecolor='r', facecolor='none')
        ax.add_patch(rect)


def show_skeleton(image, image_coord, confidence, message='', bbox=None,
                  skeleton='cmu'):
    """Confidence-gated skeleton overlay on an image
    (data_groups.py:330-375): image_coord is (2, num_joints)."""
    import matplotlib.patches as patches
    import matplotlib.pyplot as plt

    import joint_settings
    image = plt.imread(image) if isinstance(image, str) else image
    short_names = getattr(joint_settings, skeleton + '_short_names')
    parent = getattr(joint_settings, skeleton + '_parent')
    body_edges = _edges(short_names, parent)

    fig, ax = plt.subplots(figsize=(12, 8))
    ax.set_title(f'{message}:{image.shape}')
    ax.imshow(image)
    ax.set_autoscale_on(False)

    valid = (0.1 <= confidence)
    xs, ys = image_coord[0], image_coord[1]
    ax.plot(xs[valid], ys[valid], '.')
    drawable = valid[body_edges].all(axis=1)
    for edge in body_edges[drawable]:
        ax.plot(xs[edge], ys[edge])
    ax.plot(xs[valid].mean(), ys[valid].mean(), 'X', color='w')
    if bbox is not None:
        rect = patches.Rectangle((bbox[0], bbox[1]), bbox[2], bbox[3],
                                 linewidth=2, edgecolor='r', facecolor='none')
        ax.add_patch(rect)
    fig.canvas.draw_idle()
    plt.show()


def visualize(image_name, depth_cam, true_cam, spec_cam, depth_bbox):
    """Predicted-vs-GT overlay on the depth view (depth_datasets.py:295-309):
    the stored 16-bit depth PNG reads back as [0,1]*255 metres-ish units; the
    reference's /30 display rescale is kept for comparability."""
    import matplotlib.pyplot as plt

    raw = plt.imread(image_name).astype(np.float64)
    image = np.clip(raw * 255.0 * (255.0 / 30.0), 0, 255).astype(np.uint8)

    fig, (ax_pred, ax_true) = plt.subplots(1, 2, figsize=(16, 12))
    for ax, pose in ((ax_pred, spec_cam), (ax_true, true_cam)):
        ax.imshow(image, cmap='gray', vmin=0, vmax=255)
        show_mat(depth_cam.camera_to_image(pose), ax, depth_bbox)
    plt.show()


def visualize_filtered(image, skeletons, camera):
    """World skeletons projected onto an image (filter_ntu_samples.py:151-160)."""
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 8))
    ax.imshow(image)
    for skeleton in skeletons:
        show_mat(camera.world_to_image(skeleton), ax)
    plt.show()
