"""Person detection for the offline dataset-construction tools.

The reference wraps Darknet YOLOv4 via pyyolo (utils.py:82-89). YOLO is
offline-only — not part of the training framework proper (SURVEY.md §2) — so
any detector with a `detect(image) -> [np.array([x, y, w, h]), ...]` method
works. YoloDetector uses pyyolo when installed; ProjectedBoxDetector is a
fallback that "detects" by accepting the projected-skeleton box (useful for
fixture datasets and when no detector weights are available).
"""

import numpy as np


class YoloDetector:
    """utils.Detector parity (utils.py:82-89)."""

    def __init__(self, cfg='models/yolov4.cfg', weights='models/yolov4.weights',
                 data='models/coco.data'):
        import pyyolo
        self.detector = pyyolo.YOLO(cfg, weights, data)

    def detect(self, image):
        dets = self.detector.detect(image, True)
        dets = filter(lambda det: det.name == 'person', dets)
        return [np.array([det.x, det.y, det.w, det.h]) for det in dets]


class ProjectedBoxDetector:
    """Fallback: pass-through of candidate boxes set per frame. The grouping
    tools feed it the projected-skeleton bbox, so IoU gating always accepts.
    """

    def __init__(self):
        self.candidates = []

    def set_candidates(self, boxes):
        self.candidates = [np.asarray(b, np.float32) for b in boxes]

    def detect(self, image):
        return list(self.candidates)


def make_detector(kind='auto'):
    if kind in ('auto', 'yolo'):
        try:
            return YoloDetector()
        except Exception:
            # 'auto' falls back whether pyyolo is missing (ImportError) or
            # its cfg/weights files are (FileNotFoundError / pyyolo errors)
            if kind == 'yolo':
                raise
    return ProjectedBoxDetector()
