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
    """Crop a random margin of up to crop_rate on each side (ref semantics:
    indexes named w/h are swapped but operate on axes 0/1 consistently)."""

    def __init__(self, crop_rate: float = 0.1, prob: float = 1.0):
        self.crop_rate = crop_rate
        self.prob = prob

    def __call__(self, image, label, rng: np.random.Generator):
        if rng.random() < self.prob:
            h, w = image.shape[:2]
            h1 = int(rng.integers(0, max(int(h * self.crop_rate), 1)))
            w1 = int(rng.integers(0, max(int(w * self.crop_rate), 1)))
            h2 = int(rng.integers(h - int(h * self.crop_rate), h + 1))
            w2 = int(rng.integers(w - int(w * self.crop_rate), w + 1))
            image = image[h1:h2, w1:w2]
            label = label[h1:h2, w1:w2]
        return image, label


class RandomCropOut:
    """Zero out a random crop_rate-sized window."""

    def __init__(self, crop_rate: float = 0.2, prob: float = 1.0):
        self.crop_rate = crop_rate
        self.prob = prob

    def __call__(self, image, label, rng: np.random.Generator):
        if rng.random() < self.prob:
            h, w = image.shape[:2]
            h1 = int(rng.integers(0, max(int(h * self.crop_rate), 1)))
            w1 = int(rng.integers(0, max(int(w * self.crop_rate), 1)))
            h2 = h1 + int(h * self.crop_rate)
            w2 = w1 + int(w * self.crop_rate)
            image = image.copy()
            label = label.copy()
            image[h1:h2, w1:w2] = 0
            label[h1:h2, w1:w2] = 0
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
