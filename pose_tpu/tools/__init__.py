"""Offline tools (dataset construction, detection, video IO, viz,
tracking). Import submodules directly — no eager re-exports here, so a
minimal serving install (numpy only) can use e.g. tools.tracking without
pulling the offline-only scipy/cv2 dependencies of its siblings."""
