"""Paired image/label augmentations (util/augmentation.py parity, numpy).

Each callable takes (image, label, rng) and returns (image, label). Unlike
the reference (global np.random), randomness is explicit via a Generator so
training runs are reproducible.
"""

from __future__ import annotations

import numpy as np


class RandomFlip:
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def __call__(self, image, label, rng: np.random.Generator):
        if rng.random() < self.prob:
            image = image[:, ::-1]
            label = label[:, ::-1]
        return image, label


class RandomCrop:
    """Crop a random margin of up to crop_rate on each side.

    Draw order mirrors the reference exactly (util/augmentation.py:24-36,
    which names shape (w, h) but slices [w1:w2, h1:h2]): axis-1 low bound
    first, then axis-0 low, axis-1 high, axis-0 high. Bounds are guarded
    with max(..., 1) so images smaller than 1/crop_rate don't raise (the
    reference errors there)."""

    def __init__(self, crop_rate: float = 0.1, prob: float = 1.0):
        self.crop_rate = crop_rate
        self.prob = prob

    def __call__(self, image, label, rng: np.random.Generator):
        if rng.random() < self.prob:
            h0, w0 = image.shape[:2]
            c1 = int(rng.integers(0, max(int(w0 * self.crop_rate), 1)))  # axis-1 low
            r1 = int(rng.integers(0, max(int(h0 * self.crop_rate), 1)))  # axis-0 low
            # low bound truncates the FLOAT w0 - w0*rate (np.random.randint
            # semantics) — differs by 1 from w0 - int(w0*rate) when
            # w0*crop_rate is fractional
            c2 = int(rng.integers(int(w0 - w0 * self.crop_rate), w0 + 1))  # axis-1 high
            r2 = int(rng.integers(int(h0 - h0 * self.crop_rate), h0 + 1))  # axis-0 high
            image = image[r1:r2, c1:c2]
            label = label[r1:r2, c1:c2]
        return image, label


class RandomCropOut:
    """Zero out a random crop_rate-sized window."""

    def __init__(self, crop_rate: float = 0.2, prob: float = 1.0):
        self.crop_rate = crop_rate
        self.prob = prob

    def __call__(self, image, label, rng: np.random.Generator):
        if rng.random() < self.prob:
            h0, w0 = image.shape[:2]
            # reference draw order (util/augmentation.py:47-55): axis-1
            # window first, then axis-0
            c1 = int(rng.integers(0, max(int(w0 * self.crop_rate), 1)))
            r1 = int(rng.integers(0, max(int(h0 * self.crop_rate), 1)))
            c2 = c1 + int(w0 * self.crop_rate)
            r2 = r1 + int(h0 * self.crop_rate)
            image = image.copy()
            label = label.copy()
            image[r1:r2, c1:c2] = 0
            label[r1:r2, c1:c2] = 0
        return image, label


class RandomBrightness:
    def __init__(self, bright_range: float = 0.15, prob: float = 0.9):
        self.bright_range = bright_range
        self.prob = prob

    def __call__(self, image, label, rng: np.random.Generator):
        if rng.random() < self.prob:
            factor = rng.uniform(1 - self.bright_range, 1 + self.bright_range)
            image = (image * factor).astype(image.dtype)
        return image, label


class RandomNoise:
    """Additive integer noise on a 0..255 scale (reference parity)."""

    def __init__(self, noise_range: int = 5, prob: float = 0.9):
        self.noise_range = noise_range
        self.prob = prob

    def __call__(self, image, label, rng: np.random.Generator):
        if rng.random() < self.prob:
            noise = rng.integers(-self.noise_range, self.noise_range, image.shape)
            image = np.clip(image + noise, 0, 255).astype(image.dtype)
        return image, label
