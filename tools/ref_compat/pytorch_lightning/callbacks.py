class _Callback:
    def __init__(self, *args, **kwargs):
        pass


class ModelCheckpoint(_Callback):
    pass


class EarlyStopping(_Callback):
    pass


class LearningRateMonitor(_Callback):
    pass
