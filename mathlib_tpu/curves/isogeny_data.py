"""SSWU isogeny data per curve (populated by tools/derive_isogeny.py).

Each entry: {"A": A', "B": B', "Z": Z, "iso": (x_num, x_den, y_num, y_den)}
with polynomial coefficient lists low-degree-first. G1 entries are over Fp
(ints); G2 entries over Fp2 (int pairs). Empty until derived."""

G1 = {}
G2 = {}
