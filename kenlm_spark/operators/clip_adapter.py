"""Real CLIP encoders for the alignment gate (`operators/alignment.py`)
— the production counterpart of the deterministic fake encoders.

open_clip / torch / PIL are not in this container, so everything here
imports lazily and raises an actionable error; `tests/test_real_models.py`
exercises the path end-to-end when the libraries are present (it skips
cleanly otherwise). The adapter follows the fastText-adapter contract:

* nothing model-sized is pickled — the UDF closure captures only the
  (model_name, pretrained, device) strings;
* the model loads ONCE per executor process (module-level cache);
* encoders consume the whole Arrow batch in one forward pass.

Usage (see README "Real-model integration"):

    from kenlm_spark.operators.alignment import alignment_scores
    from kenlm_spark.operators.clip_adapter import open_clip_encoders

    tenc, ienc = open_clip_encoders("ViT-B-32", "laion2b_s34b_b79k")
    scored = alignment_scores(
        pairs, id_col="image_id", caption_col="caption",
        image_key_col="bytes",          # binary column: encoded image
        text_encoder=tenc, image_encoder=ienc, threshold=0.28,
    )
"""

from __future__ import annotations

#: Per-process (executor) model cache: {(model, pretrained, device): bundle}
_CLIP_CACHE: dict = {}


def _load_bundle(model_name: str, pretrained: str, device: str):
    key = (model_name, pretrained, device)
    if key not in _CLIP_CACHE:
        try:
            import open_clip  # type: ignore
            import torch  # type: ignore
        except ImportError as e:  # pragma: no cover - libs absent here
            raise ImportError(
                "open_clip/torch are not installed; pip install "
                "open_clip_torch torch (and pillow) to use the real "
                "alignment encoders, or pass fake_text_encoder/"
                "fake_image_encoder for plumbing tests."
            ) from e
        model, _, preprocess = open_clip.create_model_and_transforms(
            model_name, pretrained=pretrained
        )
        tokenizer = open_clip.get_tokenizer(model_name)
        model = model.to(device).eval()
        _CLIP_CACHE[key] = (model, preprocess, tokenizer, torch, device)
    return _CLIP_CACHE[key]


def open_clip_encoders(
    model_name: str = "ViT-B-32",
    pretrained: str = "laion2b_s34b_b79k",
    device: str = "cpu",
):
    """(text_encoder, image_encoder) for :func:`alignment_scores`.

    The text encoder takes a list of caption strings; the image encoder
    takes a list of ENCODED image bytes (the ``bytes`` binary column of
    the north-rule input schema) and decodes via PIL. Both return
    (n, dim) float64 — `alignment_scores` unit-normalizes and takes the
    cosine, so CLIP's own normalization convention does not matter."""

    def text_encoder(texts):
        model, _, tokenizer, torch, dev = _load_bundle(
            model_name, pretrained, device
        )
        with torch.no_grad():
            toks = tokenizer([t or "" for t in texts]).to(dev)
            return (
                model.encode_text(toks).cpu().numpy().astype("float64")
            )

    def image_encoder(blobs):
        import io

        from PIL import Image  # type: ignore

        model, preprocess, _, torch, dev = _load_bundle(
            model_name, pretrained, device
        )
        with torch.no_grad():
            imgs = [
                preprocess(
                    Image.open(io.BytesIO(bytes(b))).convert("RGB")
                )
                for b in blobs
            ]
            batch = torch.stack(imgs).to(dev)
            return (
                model.encode_image(batch).cpu().numpy().astype("float64")
            )

    return text_encoder, image_encoder
