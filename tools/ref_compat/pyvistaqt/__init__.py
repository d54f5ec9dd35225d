class BackgroundPlotter:
    def __init__(self, *args, **kwargs):
        raise RuntimeError("pyvistaqt shim: no GUI available")
