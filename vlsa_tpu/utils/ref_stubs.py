"""Import harness for the mounted reference repo (guarded parity tests and
the denominator measurement script): stubs the pip deps the reference imports
at module load but which we never execute (nystrom_attention, torch_geometric,
timm, torchvision, ftfy) so `model.vlsa` & co. import with torch CPU only."""
import sys
import types


def _mk_module(name):
    import importlib.machinery
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def install_reference_stubs():
    """Stub pip deps the reference imports at module load but which these
    tests never execute (nystrom_attention, torch_geometric, timm)."""
    if "nystrom_attention" not in sys.modules:
        m = _mk_module("nystrom_attention")
        m.NystromAttention = type("NystromAttention", (), {})
        m.Nystromformer = type("Nystromformer", (), {})
        sys.modules["nystrom_attention"] = m
    if "torch_geometric" not in sys.modules:
        tg = _mk_module("torch_geometric")
        tg_nn = _mk_module("torch_geometric.nn")
        tg_nn.GENConv = type("GENConv", (), {})
        tg_nn.DeepGCNLayer = type("DeepGCNLayer", (), {})
        tg.nn = tg_nn
        tg_data = _mk_module("torch_geometric.data")
        tg_data.Batch = type("Batch", (), {})
        tg_data.Data = type("Data", (), {})
        tg.data = tg_data
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.nn"] = tg_nn
        sys.modules["torch_geometric.data"] = tg_data
    if "pkg_resources" not in sys.modules:
        pr = _mk_module("pkg_resources")
        import packaging
        pr.packaging = packaging
        sys.modules["pkg_resources"] = pr
    if "ftfy" not in sys.modules:
        ftfy = _mk_module("ftfy")
        ftfy.fix_text = lambda x: x  # identity for ASCII test prompts
        sys.modules["ftfy"] = ftfy
    if "torchvision" not in sys.modules:
        tv = _mk_module("torchvision")
        tv_t = _mk_module("torchvision.transforms")
        for n in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize",
                  "InterpolationMode", "RandomResizedCrop", "ColorJitter",
                  "RandomHorizontalFlip", "Grayscale", "Lambda"):
            setattr(tv_t, n, type(n, (), {"BICUBIC": None}))
        tv.transforms = tv_t
        tv.__path__ = []
        tv_ops = _mk_module("torchvision.ops")
        tv_ops.__path__ = []
        tv_misc = _mk_module("torchvision.ops.misc")
        tv_misc.FrozenBatchNorm2d = type("FrozenBatchNorm2d", (), {})
        tv_ops.misc = tv_misc
        tv.ops = tv_ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_t
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.ops.misc"] = tv_misc
    if "timm" not in sys.modules:
        timm = _mk_module("timm")
        timm.create_model = lambda *a, **k: None
        timm_l = _mk_module("timm.layers")
        timm_l.Mlp = type("Mlp", (), {})
        timm_l.to_2tuple = lambda x: (x, x)
        timm.layers = timm_l
        timm_ml = _mk_module("timm.models")
        timm_ml.__path__ = []  # mark as package
        timm_mll = _mk_module("timm.models.layers")
        timm_mll.Mlp = timm_l.Mlp
        timm_mll.to_2tuple = timm_l.to_2tuple
        timm_ml.layers = timm_mll
        timm_vit = _mk_module("timm.models.vision_transformer")
        timm_vit.VisionTransformer = type("VisionTransformer", (), {})
        timm_ml.vision_transformer = timm_vit
        timm.models = timm_ml
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = timm_l
        sys.modules["timm.models"] = timm_ml
        sys.modules["timm.models.layers"] = timm_mll
        sys.modules["timm.models.vision_transformer"] = timm_vit
