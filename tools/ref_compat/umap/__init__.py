class UMAP:
    def __init__(self, *args, **kwargs):
        pass

    def fit_transform(self, *args, **kwargs):
        raise RuntimeError("umap shim: not available in this environment")
