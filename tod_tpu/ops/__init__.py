"""Compute kernels: static-shape, jit-friendly, MXU-first.

Replaces the reference's OpenCV ops layer (SURVEY.md section 2b): ORB feature
extraction (cv::ORB, src/training/Trainer.cpp:144-150), FLANN-LSH matching
(src/detection/DescriptorMatcher.cpp:175-187), and the rgbd depth ops
(rescaleDepth / depthTo3dSparse / isValidDepth, src/training/Trainer.cpp:46-54).
"""
