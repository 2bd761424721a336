"""Residual <-> image conversions.

The diffusion target is the residual Res = HR − LMS in [-1, 1]
(`/root/reference/utils/util.py:135-142`, `data/LRHR_dataset.py:127-133`);
sampling adds the upsampled MS back to produce the pansharpened image.
"""


def img2res(img, lms):
    return img - lms


def res2img(res, lms):
    return res + lms
