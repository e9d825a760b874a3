"""Host-side video frame generators for the offline tools (utils.py:99-126).
Video decode stays off the training critical path (SURVEY.md §2)."""

import cv2
import numpy as np


def prefetch(video_path, hflip=False):
    """RGB frame generator (utils.prefetch, utils.py:99-111)."""
    cap = cv2.VideoCapture(video_path)
    try:
        while cap.isOpened():
            ret, frame = cap.read()
            if not ret:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if hflip:
                yield np.ascontiguousarray(frame[:, ::-1])
            else:
                yield frame
    finally:
        # runs on exhaustion AND on GeneratorExit when the consumer abandons
        # the stream mid-clip (e.g. a SystemExit inside predict.py's chunk
        # loop) — otherwise the VideoCapture fd leaks for the process life
        cap.release()


def depth_prefetch(video_path, hflip=False):
    """Grayscale frame generator (utils.depth_prefetch, utils.py:114-126)."""
    cap = cv2.VideoCapture(video_path)
    try:
        while cap.isOpened():
            ret, frame = cap.read()
            if not ret:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            if hflip:
                yield np.ascontiguousarray(frame[:, ::-1])
            else:
                yield frame
    finally:
        cap.release()
