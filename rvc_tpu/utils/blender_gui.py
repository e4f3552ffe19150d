"""Standalone model-blender tool (reference EXTRAS/model_blender_gui.py:38-231).

The reference ships a tkinter front-end over checkpoint blending with a
sample-rate compatibility check and "k"-suffix SR normalization ("48k" ->
48000). The blending itself lives in utils.model_tools.model_blender (which
handles both native .npz and imported .pth); this module adds the SR
normalization helper and the optional GUI shell.
"""

from __future__ import annotations

from typing import Union

from .model_tools import model_blender


def normalize_sr(sr: Union[str, int, float]) -> Union[int, str, float]:
    """"48k" -> 48000; other values pass through
    (EXTRAS/model_blender_gui.py:12-25)."""
    if isinstance(sr, str) and sr.lower().endswith("k"):
        try:
            return int(float(sr[:-1]) * 1000)
        except ValueError:
            return sr
    return sr


def launch_gui() -> None:  # pragma: no cover - needs a display
    import tkinter as tk
    from tkinter import filedialog, messagebox, ttk

    root = tk.Tk()
    root.title("rvc_tpu model blender")
    root.geometry("520x240")

    paths = {"a": None, "b": None, "out": "logs"}
    name_var = tk.StringVar(value="blend")
    ratio_var = tk.DoubleVar(value=0.5)

    def picker(slot, label):
        def pick():
            p = filedialog.askopenfilename(
                filetypes=[("Models", "*.npz *.pth"), ("All", "*.*")])
            if p:
                paths[slot] = p
                label.config(text=p.split("/")[-1])
        return pick

    for slot, text in (("a", "Model A"), ("b", "Model B")):
        row = ttk.Frame(root)
        row.pack(pady=4, fill=tk.X, padx=10)
        lbl = ttk.Label(row, text="(none)")
        ttk.Button(row, text=f"{text}...",
                   command=picker(slot, lbl)).pack(side=tk.LEFT)
        lbl.pack(side=tk.LEFT, padx=8)

    row = ttk.Frame(root)
    row.pack(pady=4)
    ttk.Label(row, text="Name").pack(side=tk.LEFT)
    ttk.Entry(row, textvariable=name_var, width=16).pack(side=tk.LEFT, padx=6)
    ttk.Label(row, text="Ratio A→B").pack(side=tk.LEFT)
    ttk.Scale(row, from_=0.0, to=1.0, variable=ratio_var,
              length=140).pack(side=tk.LEFT, padx=6)

    def run():
        if not paths["a"] or not paths["b"]:
            messagebox.showerror("blend", "pick both models")
            return
        try:
            out = model_blender(
                name_var.get(), paths["a"], paths["b"],
                ratio=float(ratio_var.get()), output_dir=paths["out"],
            )
            messagebox.showinfo("blend", f"wrote {out}")
        except Exception as e:
            messagebox.showerror("blend", str(e))

    ttk.Button(root, text="Blend", command=run).pack(pady=10)
    root.mainloop()


def main() -> None:  # pragma: no cover - interactive CLI
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_a", nargs="?")
    ap.add_argument("model_b", nargs="?")
    ap.add_argument("--name", default="blend")
    ap.add_argument("--ratio", type=float, default=0.5)
    ap.add_argument("--output_dir", default="logs")
    args = ap.parse_args()
    if args.model_a and args.model_b:
        out = model_blender(args.name, args.model_a, args.model_b,
                            ratio=args.ratio, output_dir=args.output_dir)
        print(out)
    else:
        launch_gui()


if __name__ == "__main__":
    main()
