"""timm import stub: the reference only uses timm.utils.ModelEmaV2
(/root/reference/model.py:2, 3657)."""
