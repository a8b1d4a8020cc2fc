"""A minimal in-process tkinter double for driving the Tk shells headless.

No display exists in CI, and Xvfb is not available — but app/window.py and
app/launcher.py only use a narrow, well-defined slice of Tk (widgets,
variables with traces, event bindings, `after` timers, dialogs). This
module emulates exactly that slice with plain Python objects so tests can
install it as ``sys.modules["tkinter"]`` and drive the REAL shell wiring:
key/mouse handlers, modifier decoding, dialog flows, the auto-advance
timer — everything except pixel presentation.

Philosophy: record, don't render. Every widget keeps its constructor
arguments, children, bindings and packed state; tests fire events through
``Widget.fire`` and inspect effects through the recorded tree.
"""

from __future__ import annotations

from types import SimpleNamespace

# --- constants (the subset the shells use) -----------------------------
X, Y, BOTH, NONE = "x", "y", "both", "none"
LEFT, RIGHT, TOP, BOTTOM = "left", "right", "top", "bottom"
SUNKEN, RAISED, FLAT = "sunken", "raised", "flat"
END = "end"
W, E, N, S = "w", "e", "n", "s"
NORMAL, DISABLED = "normal", "disabled"

# module-level registries the tests read
roots: list = []
toplevels: list = []
variables: list = []


def reset():
    roots.clear()
    toplevels.clear()
    variables.clear()


class TclError(Exception):
    pass


class Event(SimpleNamespace):
    """Synthesized event: Event(keysym="w", state=0x1, x=10, y=20, ...)."""

    def __init__(self, **kw):
        defaults = dict(keysym="", state=0, x=0, y=0, delta=0, num=0,
                        char="", widget=None)
        defaults.update(kw)
        super().__init__(**defaults)


class Variable:
    def __init__(self, master=None, value=None, name=None):
        self._value = value
        self._traces = []
        variables.append(self)

    def get(self):
        return self._value

    def set(self, value):
        self._value = value
        for mode, fn in self._traces:
            if mode == "write":
                fn(None, None, "write")

    def trace_add(self, mode, fn):
        self._traces.append((mode, fn))
        return f"trace{len(self._traces)}"


class StringVar(Variable):
    def __init__(self, master=None, value="", name=None):
        super().__init__(master, value, name)

    def get(self):
        return "" if self._value is None else str(self._value)


class BooleanVar(Variable):
    def __init__(self, master=None, value=False, name=None):
        super().__init__(master, value, name)

    def get(self):
        return bool(self._value)


class IntVar(Variable):
    def __init__(self, master=None, value=0, name=None):
        super().__init__(master, value, name)

    def get(self):
        return int(self._value or 0)


class Widget:
    def __init__(self, master=None, **kw):
        self.master = master
        self.kw = dict(kw)
        self.children = []
        self.bindings = {}
        self.packed = False
        self.destroyed = False
        self._pack_kw = None
        if master is not None and hasattr(master, "children"):
            master.children.append(self)

    # geometry managers: record only
    def pack(self, **kw):
        self.packed = True
        self._pack_kw = kw
        return self

    def grid(self, **kw):
        self.packed = True
        self._pack_kw = kw
        return self

    def place(self, **kw):
        self.packed = True
        self._pack_kw = kw
        return self

    def place_forget(self):
        self.packed = False

    def pack_forget(self):
        self.packed = False

    def config(self, **kw):
        self.kw.update(kw)

    configure = config

    def cget(self, key):
        return self.kw.get(key)

    def __setitem__(self, key, value):
        self.kw[key] = value

    def __getitem__(self, key):
        return self.kw.get(key)

    def bind(self, seq, fn):
        self.bindings.setdefault(seq, []).append(fn)

    def fire(self, seq, event=None):
        """Deliver a synthesized event to this widget's handlers."""
        event = event or Event()
        out = None
        for fn in self.bindings.get(seq, []):
            out = fn(event)
        return out

    def winfo_children(self):
        return [c for c in self.children if not c.destroyed]

    def destroy(self):
        self.destroyed = True
        for c in self.children:
            c.destroy()

    def focus_set(self):
        pass

    focus = focus_set

    def update_idletasks(self):
        pass

    def winfo_width(self):
        return int(self.kw.get("width", 100) or 100)

    def winfo_height(self):
        return int(self.kw.get("height", 100) or 100)

    def winfo_rootx(self):
        return 0

    def winfo_rooty(self):
        return 0

    def wait_window(self):
        pass

    def grab_set(self):
        pass

    def transient(self, other=None):
        pass

    def lift(self):
        pass

    def protocol(self, name, fn):
        self.kw.setdefault("protocols", {})[name] = fn


class _TimerMixin:
    def _init_timers(self):
        self._after = {}
        self._after_seq = 0

    def after(self, ms, fn=None, *args):
        self._after_seq += 1
        aid = f"after#{self._after_seq}"
        if fn is not None:
            self._after[aid] = (ms, fn, args)
        return aid

    def after_cancel(self, aid):
        self._after.pop(aid, None)

    def run_pending_after(self):
        """Run the currently-scheduled after callbacks once (new
        callbacks they schedule wait for the next call — a manual clock
        tick)."""
        pending = list(self._after.items())
        self._after.clear()
        for _, (ms, fn, args) in pending:
            fn(*args)
        return len(pending)


class Tk(Widget, _TimerMixin):
    def __init__(self, **kw):
        super().__init__(None, **kw)
        self._init_timers()
        self._title = ""
        roots.append(self)

    def title(self, text=None):
        if text is not None:
            self._title = text
        return self._title

    def mainloop(self):
        pass

    def geometry(self, spec=None):
        self.kw["geometry"] = spec

    def resizable(self, *a, **k):
        pass

    def quit(self):
        pass

    def winfo_screenwidth(self):
        return 1920

    def winfo_screenheight(self):
        return 1080

    def option_add(self, *a):
        pass


class Toplevel(Widget, _TimerMixin):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._init_timers()
        self._title = ""
        toplevels.append(self)

    def title(self, text=None):
        if text is not None:
            self._title = text
        return self._title

    def geometry(self, spec=None):
        self.kw["geometry"] = spec

    def resizable(self, *a, **k):
        pass


class Frame(Widget):
    pass


class LabelFrame(Widget):
    pass


class Label(Widget):
    pass


class Entry(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)

    def get(self):
        var = self.kw.get("textvariable")
        return var.get() if var is not None else self.kw.get("_text", "")

    def insert(self, index, text):
        var = self.kw.get("textvariable")
        if var is not None:
            var.set(var.get() + text)
        else:
            self.kw["_text"] = self.kw.get("_text", "") + text

    def delete(self, first, last=None):
        var = self.kw.get("textvariable")
        if var is not None:
            var.set("")
        else:
            self.kw["_text"] = ""

    def icursor(self, index):
        pass

    def selection_range(self, a, b):
        pass


class Button(Widget):
    def invoke(self):
        cmd = self.kw.get("command")
        if cmd is not None:
            return cmd()


class Checkbutton(Widget):
    def invoke(self):
        var = self.kw.get("variable")
        if var is not None:
            var.set(not var.get())
        cmd = self.kw.get("command")
        if cmd is not None:
            cmd()


class Radiobutton(Widget):
    def invoke(self):
        var = self.kw.get("variable")
        if var is not None:
            var.set(self.kw.get("value"))
        cmd = self.kw.get("command")
        if cmd is not None:
            cmd()


class Listbox(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self.items = []
        self.selection = ()

    def insert(self, index, *items):
        if index == END:
            self.items.extend(items)
        else:
            for i, it in enumerate(items):
                self.items.insert(index + i, it)

    def delete(self, first, last=None):
        if first == 0 and last == END:
            self.items = []
        elif last is None:
            del self.items[first]

    def curselection(self):
        return self.selection

    def selection_set(self, index):
        self.selection = (index,)

    def selection_clear(self, first, last=None):
        self.selection = ()

    def see(self, index):
        pass

    def activate(self, index):
        pass

    def size(self):
        return len(self.items)

    def get(self, index):
        return self.items[index]


class Canvas(Widget):
    def __init__(self, master=None, **kw):
        super().__init__(master, **kw)
        self._items = {}
        self._seq = 0

    def _new(self, kind, coords, kw):
        self._seq += 1
        tags = kw.get("tags", ())
        if isinstance(tags, str):
            tags = (tags,)
        self._items[self._seq] = dict(kind=kind, coords=list(coords),
                                      tags=tuple(tags), kw=kw)
        return self._seq

    def create_image(self, *coords, **kw):
        return self._new("image", coords, kw)

    def create_line(self, *coords, **kw):
        return self._new("line", coords, kw)

    def create_text(self, *coords, **kw):
        return self._new("text", coords, kw)

    def create_rectangle(self, *coords, **kw):
        return self._new("rectangle", coords, kw)

    def coords(self, item, *coords):
        if coords:
            self._items[item]["coords"] = list(coords)
        return self._items[item]["coords"]

    def delete(self, spec):
        if spec in self._items:
            del self._items[spec]
            return
        doomed = [i for i, it in self._items.items()
                  if spec in it["tags"] or spec == "all"]
        for i in doomed:
            del self._items[i]

    def find_withtag(self, tag):
        return tuple(i for i, it in self._items.items()
                     if tag in it["tags"])

    def itemconfig(self, item, **kw):
        self._items[item]["kw"].update(kw)


class Scrollbar(Widget):
    def set(self, *a):
        pass


class Menu(Widget):
    def add_command(self, **kw):
        self.children.append(SimpleNamespace(kw=kw))

    def post(self, x, y):
        pass


class _FileDialog:
    """tkinter.filedialog stand-in: tests set .save_path / .open_path."""

    save_path = ""
    open_path = ""

    def asksaveasfilename(self, **kw):
        self.last_save_kw = kw
        return self.save_path

    def askopenfilename(self, **kw):
        self.last_open_kw = kw
        return self.open_path


class _MessageBox:
    def __init__(self):
        self.messages = []

    def showerror(self, title, message):
        self.messages.append(("error", title, message))

    def showinfo(self, title, message):
        self.messages.append(("info", title, message))

    def askyesno(self, title, message):
        self.messages.append(("askyesno", title, message))
        return True


filedialog = _FileDialog()
messagebox = _MessageBox()


class _Ttk:
    """tkinter.ttk stand-in: Combobox is the only ttk widget used."""

    class Combobox(Entry):
        def __init__(self, master=None, **kw):
            super().__init__(master, **kw)
            self.values = list(kw.get("values", ()))

        def current(self, index=None):
            var = self.kw.get("textvariable")
            if index is not None and self.values:
                if var is not None:
                    var.set(self.values[index])
                return None
            if var is not None and var.get() in self.values:
                return self.values.index(var.get())
            return -1

        def set(self, value):
            var = self.kw.get("textvariable")
            if var is not None:
                var.set(value)
            else:
                self.kw["_text"] = value

        def get(self):
            return super().get() or self.kw.get("_text", "")

    Frame = Frame
    Label = Label
    Button = Button


ttk = _Ttk()


# --- helpers for tests --------------------------------------------------

def descendants(widget):
    """All widgets below `widget`, breadth-first in creation order
    (deterministic — tests index into this)."""
    out = []
    queue = list(widget.children)
    while queue:
        w = queue.pop(0)
        out.append(w)
        queue.extend(w.children)
    return out


def find_buttons(widget, text):
    return [w for w in descendants(widget)
            if isinstance(w, Button) and w.kw.get("text") == text]


def find_by_class(widget, cls):
    return [w for w in descendants(widget) if isinstance(w, cls)]


def install(monkeypatch):
    """Install this module as tkinter (+ submodules) for the test."""
    import sys

    me = sys.modules[__name__]
    reset()
    monkeypatch.setitem(sys.modules, "tkinter", me)
    monkeypatch.setitem(sys.modules, "tkinter.filedialog", filedialog)
    monkeypatch.setitem(sys.modules, "tkinter.messagebox", messagebox)
    monkeypatch.setitem(sys.modules, "tkinter.ttk", ttk)
    return me
