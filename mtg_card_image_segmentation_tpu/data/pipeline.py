"""Input pipelines: device-resident synthetic stream + host-decode file
stream, both yielding mesh-sharded (images, masks) batches.

Replaces the reference's torch DataLoader (train/dataset.py:208-260, 4 CPU
workers doing decode+augment per sample). The TPU-native design moves
augmentation onto the device (data/augment.py) and — for the synthetic
source — generates the data there too, so the hot path never blocks on the
host at all.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.config import AugmentConfig
from mtg_card_image_segmentation_tpu.data.augment import augment_batch
from mtg_card_image_segmentation_tpu.data.dataset import CardSegmentationDataset
from mtg_card_image_segmentation_tpu.data.preprocess import (
    normalize_only,
    preprocess_batch,
)
from mtg_card_image_segmentation_tpu.data.synthetic import (
    NEGATIVE_PROB,
    synthetic_augmented_batch,
    synthetic_batch,
)
from mtg_card_image_segmentation_tpu.parallel.mesh import is_trivial, shard_batch


def _local_batch(batch_size: int) -> int:
    """Per-process batch under multi-host: ``batch_size`` is the GLOBAL
    batch; each process produces 1/process_count of it."""
    from mtg_card_image_segmentation_tpu.parallel import distributed

    return distributed.local_batch_size(batch_size)


def _to_global(mesh, images, masks):
    """Route a per-process batch onto the mesh: single-process device_put
    or multi-host global-array assembly (no cross-host data movement)."""
    if jax.process_count() == 1:
        return shard_batch(mesh, images, masks)
    from mtg_card_image_segmentation_tpu.parallel import distributed

    return distributed.global_batch(
        mesh, np.asarray(images), None if masks is None else np.asarray(masks)
    )


class SyntheticPipeline:
    """Infinite on-device stream of rendered+augmented+normalized batches."""

    def __init__(
        self,
        batch_size: int,
        height: int,
        width: int,
        mesh=None,
        augment: Optional[AugmentConfig] = AugmentConfig(),
        seed: int = 0,
        assets=None,
        real_prob: float = 0.7,
    ) -> None:
        self.batch_size = batch_size
        self.height = height
        self.width = width
        self.mesh = mesh
        self.augment = augment
        self._key = jax.random.key(seed)
        local_bs = _local_batch(batch_size)
        if jax.process_count() > 1:  # distinct stream per host
            self._key = jax.random.fold_in(self._key, jax.process_index())

        aug = augment

        def make(key):
            if aug is not None and aug.enabled:
                # fused render+augment: geometry composes into the render
                # coordinates (zero gathers — see synthetic_augmented_sample)
                sample = synthetic_augmented_batch(
                    key, local_bs, height, width, NEGATIVE_PROB, aug,
                    assets=assets, real_prob=real_prob,
                )
            else:
                sample = synthetic_batch(
                    key, local_bs, height, width, NEGATIVE_PROB,
                    assets, real_prob,
                )
            return normalize_only(sample.image), sample.mask

        self._make = jax.jit(make)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        while True:
            self._key, sub = jax.random.split(self._key)
            images, masks = self._make(sub)
            if self.mesh is not None:
                images, masks = _to_global(self.mesh, images, masks)
            yield images, masks


class PoseSyntheticPipeline:
    """On-device stream of (images01, target_heatmaps, corners_px) for the
    corner-keypoint pipelines.

    Matches the custom-pose contract: images are /255 only (no ImageNet
    normalization, inference_test.py:167-169), targets are per-corner
    Gaussian heatmaps at (hm_h, hm_w) with sigma=2
    (train-pose-estimation_custom/dataset.py:317-331), corners in canonical
    image-space TL,TR,BR,BL order (synthetic.canonicalize_corners).
    Negatives are disabled (corner annotations only exist for card images).
    """

    FLIP_IDX = (1, 0, 3, 2)

    def __init__(
        self,
        batch_size: int,
        height: int,
        width: int,
        heatmap_height: int,
        heatmap_width: int,
        sigma: float = 2.0,
        mesh=None,
        augment: Optional[AugmentConfig] = None,
        seed: int = 0,
        assets=None,
        real_prob: float = 0.7,
    ) -> None:
        from mtg_card_image_segmentation_tpu.ops.heatmap import (
            gaussian_heatmaps_batch,
            pixels_to_heatmap_coords,
        )

        self.mesh = mesh
        self._key = jax.random.key(seed)
        local_bs = _local_batch(batch_size)
        if jax.process_count() > 1:
            self._key = jax.random.fold_in(self._key, jax.process_index())
        batch_size = local_bs
        aug = augment
        flip_idx = self.FLIP_IDX

        def make(key):
            if aug is not None and aug.enabled:
                # fused render+augment (keypoint path: no elastic/grid so the
                # corner coordinates stay exact, like augment_sample);
                # keep_in_frame: base scene corners in-view (the reference's
                # annotations derive from visible masks) — the affine aug may
                # still push some out at train time, like the reference's
                # zoom/rotation transforms
                sample = synthetic_augmented_batch(
                    key, batch_size, height, width, 0.0, aug,
                    with_displacement=False, flip_idx=flip_idx,
                    assets=assets, real_prob=real_prob, keep_in_frame=True,
                )
            else:
                sample = synthetic_batch(
                    key, batch_size, height, width, 0.0, assets, real_prob,
                    keep_in_frame=True,
                )
            images, corners = sample.image, sample.corners
            hm_coords = pixels_to_heatmap_coords(
                corners, (height, width), (heatmap_height, heatmap_width)
            )
            targets = gaussian_heatmaps_batch(
                hm_coords, heatmap_height, heatmap_width, sigma
            )
            return images, targets, corners

        self._make = jax.jit(make)

    def __iter__(self):
        from mtg_card_image_segmentation_tpu.parallel.mesh import batch_spec

        while True:
            self._key, sub = jax.random.split(self._key)
            images, targets, corners = self._make(sub)
            if jax.process_count() > 1:
                from jax.sharding import PartitionSpec as P

                from mtg_card_image_segmentation_tpu.parallel import distributed
                from mtg_card_image_segmentation_tpu.parallel.mesh import (
                    AXIS_DATA,
                    AXIS_HOSTS,
                )

                # pose batches shard only the batch dim (heatmap targets /
                # corners have no space-sharded H axis)
                bspec = P((AXIS_HOSTS, AXIS_DATA))
                images, targets, corners = distributed.global_arrays(
                    self.mesh, images, targets, corners,
                    specs=[bspec, bspec, bspec],
                )
            elif self.mesh is not None and not is_trivial(self.mesh):
                from jax.sharding import NamedSharding

                sh = NamedSharding(self.mesh, batch_spec())
                images = jax.device_put(images, sh)
                targets = jax.device_put(targets, sh)
            yield images, targets, corners


class FilePipeline:
    """Host-decode (cv2, prefetch thread) -> device resize/normalize/augment.

    Yields ``steps_per_epoch`` ``(images, masks, valid)`` triples per epoch,
    where ``valid`` is the number of real (non-padded) leading samples; pass
    ``shuffle=False`` for evaluation. The last incomplete batch is dropped in
    training (reference drop_last=True, train/dataset.py:208-260) and padded
    to the static batch shape in eval — consumers must trim/weight by
    ``valid`` before accumulating metrics.
    """

    def __init__(
        self,
        dataset: CardSegmentationDataset,
        batch_size: int,
        height: int,
        width: int,
        mesh=None,
        augment: Optional[AugmentConfig] = None,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.height = height
        self.width = width
        self.mesh = mesh
        self.augment = augment
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.key(seed)
        self._local_bs = _local_batch(batch_size)
        if jax.process_count() > 1:
            # multi-host: each process decodes only its own index shard;
            # eval-style padded batches need per-process valid accounting,
            # so multi-host file pipelines are a training path
            assert drop_last, "multi-host FilePipeline requires drop_last"
            self._key = jax.random.fold_in(self._key, jax.process_index())

    @property
    def steps_per_epoch(self) -> int:
        n = len(self.dataset)
        if jax.process_count() > 1:
            # computed from the GLOBAL count so every process agrees (they
            # join the same collectives each step; a per-shard count can
            # differ by one across processes and deadlock the epoch end).
            # Every strided shard holds >= floor(n/world) >= steps*local_bs
            # items, so each process can always fill its slice.
            return n // self.batch_size
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _host_batches(self):
        order = np.arange(len(self.dataset))
        if jax.process_count() > 1:
            from mtg_card_image_segmentation_tpu.parallel import distributed

            order = np.asarray(distributed.process_shard(list(order)))
        if self.shuffle:
            self._rng.shuffle(order)
        n = self.steps_per_epoch
        for b in range(n):
            idxs = order[b * self._local_bs : (b + 1) * self._local_bs]
            imgs, masks = [], []
            for i in idxs:
                img, m = self.dataset.load_raw(int(i))
                imgs.append(img)
                masks.append(m)
            while len(imgs) < self._local_bs:  # eval padding
                imgs.append(np.zeros_like(imgs[0]))
                masks.append(np.zeros_like(masks[0]))
            # host-side resize to a common shape only if sizes differ
            shapes = {im.shape for im in imgs}
            if len(shapes) > 1:
                import cv2

                h0, w0 = imgs[0].shape[:2]
                imgs = [
                    cv2.resize(im, (w0, h0), interpolation=cv2.INTER_LINEAR)
                    for im in imgs
                ]
                masks = [
                    cv2.resize(m, (w0, h0), interpolation=cv2.INTER_NEAREST)
                    for m in masks
                ]
            yield np.stack(imgs), np.stack(masks), len(idxs)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array, int]]:
        """One epoch of device batches (prefetched by a host thread)."""
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        sentinel = object()

        def producer():
            try:
                for item in self._host_batches():
                    q.put(item)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            imgs_u8, masks_u8, valid = item
            images, masks = preprocess_batch(
                jnp.asarray(imgs_u8), jnp.asarray(masks_u8),
                self.height, self.width, self.augment is None,
            )
            if self.augment is not None and self.augment.enabled:
                # augment on [0,1] images, then normalize
                self._key, sub = jax.random.split(self._key)
                out = augment_batch(sub, images, masks, self.augment)
                images, masks = normalize_only(out.image), out.mask
            if self.mesh is not None:
                images, masks = _to_global(self.mesh, images, masks)
            yield images, masks, valid
