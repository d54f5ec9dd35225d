class WandbLogger:
    def __init__(self, *args, **kwargs):
        pass
