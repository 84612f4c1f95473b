"""Device compute kernels (XLA + Pallas).

Each module re-implements, TPU-first, one of the native capabilities the
reference outsources to OpenCV/SciPy (SURVEY.md §2 "native components"):

  ransac       — fixed-budget, fully vmapped hypothesis engine
                 (ref: src/vo/algorithms/ransac.py adaptive loop)
  epipolar     — normalized 8-point F, E decomposition, relative pose
                 (ref: src/vo/landmarks/triangulation.py:110-350)
  triangulate  — batched DLT two-view / track-start triangulation
                 (ref: triangulation.py:352-389 per-point SVD loop)
  pnp          — Grunert P3P minimal solver + RANSAC + Gauss-Newton refine
                 (ref: src/vo/pose_estimation/p3p.py via cv2.solvePnP/scipy)
  image        — grayscale, Sobel, Gaussian pyramids (ref: scipy convolve2d)
  harris       — Harris/Shi-Tomasi response + top-K NMS (ref: harris.py, cv2)
  descriptors  — patch descriptors + batched matching (ref: harris.py, BFMatcher)
  klt          — pyramidal Lucas-Kanade tracking (ref: cv2.calcOpticalFlowPyrLK)
"""
