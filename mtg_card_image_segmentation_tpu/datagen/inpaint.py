"""GenAI background inpainting (parity with the reference's experimental
``dataset_generator/augmentation.py``): replace the background *behind* the
card mask of a rendered sample with generated scenery, as a diversity
augmentation for the synthetic dataset.

Two backends:

- :class:`CloudflareInpainter` — the reference's mechanism
  (augmentation.py:60-125): POST to the Cloudflare Workers AI Stable
  Diffusion v1.5 inpainting endpoint with the image, the *inverted* card
  mask (inpaint the background, keep the card), and a randomized scene
  prompt. Network access goes through an injectable requests-like session
  (stub-testable; this build environment has zero egress).
- :func:`procedural_inpaint` — an offline, on-device fallback: swaps the
  background for a freshly sampled procedural scene (same generator the
  synthetic renderer uses) with a soft alpha from the mask. Not diffusion,
  but provides the same dataset-level effect (background diversity with
  pixel-exact label preservation) with zero external dependencies.

CLI (mirrors the reference's standalone script):

  python -m mtg_card_image_segmentation_tpu.datagen.inpaint \\
      --image dataset/train/images/x.jpg --mask dataset/train/masks/x.png \\
      --backend procedural --output inpainted.png
"""

from __future__ import annotations

import argparse
import io
import os
import random
from typing import List, Optional

import numpy as np

CLOUDFLARE_MODEL = "@cf/runwayml/stable-diffusion-v1-5-inpainting"

# own prompt pool, same three-part structure (subject, style, setting) as
# the reference's gen_prompt (augmentation.py:14-46)
_SUBJECTS = [
    "a trading card lying on a table",
    "a collectible card held between two fingers",
    "a game card resting on a play mat",
    "a card propped against a stack of deck boxes",
    "a single card under soft window light",
    "a card at the edge of a tournament table",
]
_STYLES = [
    "photorealistic",
    "shallow depth of field",
    "studio product photography",
    "natural indoor lighting",
]
_SETTINGS = [
    "on green felt",
    "on dark wood grain",
    "on a marble slab",
    "in a cluttered hobby room",
    "in a dim card shop",
    "on a glass display case",
    "next to scattered dice",
    "with bookshelves behind",
]


def random_prompt(rng: Optional[random.Random] = None) -> str:
    r = rng or random
    return ", ".join(
        (r.choice(_SUBJECTS), r.choice(_STYLES), r.choice(_SETTINGS))
    )


def _png_int_array(path_or_array, invert: bool = False) -> List[int]:
    """Encode an image file/array as the uint8 PNG byte list the Workers AI
    REST API consumes (augmentation.py:49-57)."""
    from PIL import Image, ImageOps

    if isinstance(path_or_array, (str, os.PathLike)):
        img = Image.open(path_or_array)
    else:
        img = Image.fromarray(np.asarray(path_or_array, np.uint8))
    if invert:
        img = ImageOps.invert(img.convert("L"))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return list(buf.getvalue())


class CloudflareInpainter:
    """Workers AI SD-1.5 inpainting client (augmentation.py:60-125).

    ``session`` is any requests-like object with ``.post`` — inject a stub
    for tests or offline use. Credentials come from args or the
    ``CLOUDFLARE_ACCOUNT_ID`` / ``CLOUDFLARE_API_TOKEN`` env vars.
    """

    def __init__(
        self,
        account_id: Optional[str] = None,
        api_token: Optional[str] = None,
        session=None,
        num_steps: int = 20,
        guidance: float = 7.5,
        retries: int = 3,
    ) -> None:
        self.account_id = account_id or os.environ.get("CLOUDFLARE_ACCOUNT_ID")
        self.api_token = api_token or os.environ.get("CLOUDFLARE_API_TOKEN")
        if session is None:
            try:
                import requests

                session = requests.Session()
            except ImportError:  # pragma: no cover
                session = None
        self.session = session
        self.num_steps = num_steps
        self.guidance = guidance
        self.retries = retries

    @property
    def url(self) -> str:
        return (
            f"https://api.cloudflare.com/client/v4/accounts/"
            f"{self.account_id}/ai/run/{CLOUDFLARE_MODEL}"
        )

    def inpaint_background(
        self,
        image,
        mask,
        prompt: Optional[str] = None,
        height: int = 640,
        width: int = 480,
        seed: Optional[int] = None,
    ) -> bytes:
        """Replace everything OUTSIDE the card mask. ``image``/``mask`` are
        paths or uint8 arrays; the mask is inverted before the call because
        the API paints where the mask is white (augmentation.py:97)."""
        if self.session is None:
            raise RuntimeError("no HTTP session (offline environment?)")
        if not (self.account_id and self.api_token):
            raise RuntimeError(
                "Cloudflare credentials missing: set CLOUDFLARE_ACCOUNT_ID "
                "and CLOUDFLARE_API_TOKEN"
            )
        payload = {
            "image": _png_int_array(image),
            "mask": _png_int_array(mask, invert=True),
            "prompt": prompt or random_prompt(),
            "height": height,
            "width": width,
            "num_steps": self.num_steps,
            "strength": 1,
            "guidance": self.guidance,
        }
        if seed is not None:
            payload["seed"] = int(seed)
        headers = {
            "Authorization": f"Bearer {self.api_token}",
            "Content-Type": "application/json",
        }
        last_err: Optional[Exception] = None
        for attempt in range(self.retries):
            try:
                resp = self.session.post(
                    self.url, json=payload, headers=headers, timeout=120
                )
                if resp.status_code == 200:
                    return resp.content
                last_err = RuntimeError(f"HTTP {resp.status_code}: {resp.text[:200]}")
            except Exception as e:  # noqa: BLE001
                last_err = e
            import time

            time.sleep(2**attempt)
        raise RuntimeError(f"inpainting failed after {self.retries} tries: {last_err}")


def procedural_inpaint(image: np.ndarray, mask: np.ndarray, seed: int = 0) -> np.ndarray:
    """Offline background replacement: sample a fresh procedural background
    (data/synthetic.py generator) and composite the masked card over it.

    image: (H, W, 3) uint8; mask: (H, W) uint8/bool (card=nonzero).
    Returns (H, W, 3) uint8 with the identical card pixels and a new
    background — labels (mask, corners) stay exactly valid.
    """
    import functools

    import jax

    from mtg_card_image_segmentation_tpu.data.synthetic import _background

    h, w = mask.shape[:2]
    key = jax.random.key(seed)
    bg = np.asarray(
        jax.jit(functools.partial(_background, h=h, w=w))(key)
    )
    bg_u8 = np.clip(bg * 255.0, 0, 255).astype(np.uint8)
    alpha = (np.asarray(mask) > 0).astype(np.uint8)[..., None]
    return np.asarray(image) * alpha + bg_u8 * (1 - alpha)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image", required=True)
    parser.add_argument("--mask", required=True)
    parser.add_argument("--output", default="inpainted.png")
    parser.add_argument("--backend", choices=["cloudflare", "procedural"],
                        default="procedural")
    parser.add_argument("--prompt", default=None)
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args()

    from PIL import Image

    if args.backend == "cloudflare":
        out = CloudflareInpainter().inpaint_background(
            args.image, args.mask, prompt=args.prompt, seed=args.seed
        )
        with open(args.output, "wb") as f:
            f.write(out)
    else:
        img = np.asarray(Image.open(args.image).convert("RGB"))
        mask = np.asarray(Image.open(args.mask).convert("L"))
        out = procedural_inpaint(img, mask, seed=args.seed or 0)
        Image.fromarray(out).save(args.output)
    print(f"inpainted ({args.backend}) -> {args.output}")


if __name__ == "__main__":
    main()
