"""Generic string registry with decorator registration.

Parity target: dmb/utils/registry.py:10-44 — a dict with a register
decorator; the concrete registries live in models/builder.py
(BACKBONES / AGGREGATORS / REFINEMENTS) and flow/models.py.
"""


class Registry(dict):
    def __init__(self, name, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.name = name

    def register(self, key=None, module=None):
        """Use as ``reg.register('Name', cls)`` or ``@reg.register('Name')``
        or ``@reg.register`` (key defaults to the class name)."""
        if module is not None:
            self._set(key or module.__name__, module)
            return module
        if callable(key):  # bare @register
            self._set(key.__name__, key)
            return key

        def deco(fn):
            self._set(key or fn.__name__, fn)
            return fn
        return deco

    def _set(self, key, module):
        if key in self:
            raise KeyError(f"{key} already registered in {self.name}")
        self[key] = module
