from ziragroundingdino_tpu.text.masks import (  # noqa: F401
    SPECIAL_TOKEN_IDS,
    generate_special_token_masks,
    recover_to_cls_logits,
)
