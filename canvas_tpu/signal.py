"""Weakref-based signal/slot, used throughout the editor model.

Capability match for /root/reference/fluggo/signal.py: connecting a bound
method does not keep its object alive; dead slots are dropped silently.
Plain functions are also supported (held strongly).
"""

import weakref

__all__ = ['Signal']


class Signal:
    def __init__(self):
        # key -> weakref to the receiver object (None key part for functions)
        self._slots = {}

    def __call__(self, *args, **kwargs):
        for key in list(self._slots):
            entry = self._slots.get(key)
            if entry is None:
                continue
            func, ref = entry
            if ref is None:
                func(*args, **kwargs)
            else:
                obj = ref()
                if obj is None:
                    self._slots.pop(key, None)
                else:
                    func(obj, *args, **kwargs)

    fire = __call__

    def connect(self, slot):
        if hasattr(slot, '__self__') and slot.__self__ is not None:
            key = (slot.__func__, id(slot.__self__))

            def _cleanup(ref, self_ref=weakref.ref(self), key=key):
                inst = self_ref()
                # Only pop the entry this dying ref created: the key is
                # (func, id(obj)), and a new object allocated at the
                # same id may have re-registered under it.
                if inst is not None:
                    entry = inst._slots.get(key)
                    if entry is not None and entry[1] is ref:
                        inst._slots.pop(key, None)

            self._slots[key] = (slot.__func__, weakref.ref(slot.__self__, _cleanup))
        else:
            key = (slot, None)
            self._slots[key] = (slot, None)

    def disconnect(self, slot):
        if hasattr(slot, '__self__') and slot.__self__ is not None:
            key = (slot.__func__, id(slot.__self__))
        else:
            key = (slot, None)
        self._slots.pop(key, None)

    def clear(self):
        self._slots.clear()

    def __len__(self):
        return len(self._slots)
