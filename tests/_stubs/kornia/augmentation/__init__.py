class _Unavailable:
    def __init__(self, *a, **k):
        msg = "kornia stub: augmentation not available in tests"
        raise RuntimeError(msg)


class AugmentationSequential(_Unavailable):
    pass


class RandomHorizontalFlip(_Unavailable):
    pass


class RandomVerticalFlip(_Unavailable):
    pass


class RandomRotation90(_Unavailable):
    pass


class RandomResizedCrop(_Unavailable):
    pass
