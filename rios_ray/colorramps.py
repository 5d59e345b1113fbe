"""Built-in color ramps (the reference's colorbrewer set,
``/root/reference/rios/colortable.py:43-279`` ``loadBuiltinRamps`` /
``addRamp`` / ``genTable``): 42 ramps — the www.colorbrewer.org
palettes by Cynthia A. Brewer (Geography, Pennsylvania State
University; Apache-2.0 palette data) plus the matplotlib-family
perceptual ramps (viridis/cividis/inferno/magma/plasma) and
gray/rainbow — stored as space-separated 0-255 control-point strings
and linearly interpolated to any table size.

``gen_ramp_table`` mirrors the reference's ``genTable`` semantics
(``colortable.py:319-392``): control points evenly spread over
[0, num_entries] (or caller-supplied ``color_points``), ``np.interp``
per channel, alpha 255, optional fully-transparent ``ignore_val`` row.
User ramps register via ``add_ramp`` (``colortable.py:288-307``).
"""

from __future__ import annotations

import numpy as np

_RAMP_DATA = {
    "Accent": ("127 190 253 255 56 240 191 102",
             "201 174 192 255 108 2 91 102",
             "127 212 134 153 176 127 23 102"),
    "Blues": ("247 222 198 158 107 66 33 8 8",
             "251 235 219 202 174 146 113 81 48",
             "255 247 239 225 214 198 181 156 107"),
    "BrBG": ("84 140 191 223 246 245 199 128 53 1 0",
             "48 81 129 194 232 245 234 205 151 102 60",
             "5 10 45 125 195 245 229 193 143 94 48"),
    "BuGn": ("247 229 204 153 102 65 35 0 0",
             "252 245 236 216 194 174 139 109 68",
             "253 249 230 201 164 118 69 44 27"),
    "BuPu": ("247 224 191 158 140 140 136 129 77",
             "252 236 211 188 150 107 65 15 0",
             "253 244 230 218 198 177 157 124 75"),
    "Dark2": ("27 217 117 231 102 230 166 102",
             "158 95 112 41 166 171 118 102",
             "119 2 179 138 30 2 29 102"),
    "GnBu": ("247 224 204 168 123 78 43 8 8",
             "252 243 235 221 204 179 140 104 64",
             "240 219 197 181 196 211 190 172 129"),
    "Greens": ("247 229 199 161 116 65 35 0 0",
             "252 245 233 217 196 171 139 109 68",
             "245 224 192 155 118 93 69 44 27"),
    "Greys": ("255 240 217 189 150 115 82 37 0",
             "255 240 217 189 150 115 82 37 0",
             "255 240 217 189 150 115 82 37 0"),
    "OrRd": ("255 254 253 253 252 239 215 179 127",
             "247 232 212 187 141 101 48 0 0",
             "236 200 158 132 89 72 31 0 0"),
    "Oranges": ("255 254 253 253 253 241 217 166 127",
             "245 230 208 174 141 105 72 54 39",
             "235 206 162 107 60 19 1 3 4"),
    "PRGn": ("64 118 153 194 231 247 217 166 90 27 0",
             "0 42 112 165 212 247 240 219 174 120 68",
             "75 131 171 207 232 247 211 160 97 55 27"),
    "Paired": ("166 31 178 51 251 227 253 255 202 106 255 177",
             "206 120 223 160 154 26 191 127 178 61 255 89",
             "227 180 138 44 153 28 111 0 214 154 153 40"),
    "Pastel1": ("251 179 204 222 254 255 229 253 242",
             "180 205 235 203 217 255 216 218 242",
             "174 227 197 228 166 204 189 236 242"),
    "Pastel2": ("179 253 203 244 230 255 241 204",
             "226 205 213 202 245 242 226 204",
             "205 172 232 228 201 174 204 204"),
    "PiYG": ("142 197 222 241 253 247 230 184 127 77 39",
             "1 27 119 182 224 247 245 225 188 146 100",
             "82 125 174 218 239 247 208 134 65 33 25"),
    "PuBu": ("255 236 208 166 116 54 5 4 2",
             "247 231 209 189 169 144 112 90 56",
             "251 242 230 219 207 192 176 141 88"),
    "PuBuGn": ("255 236 208 166 103 54 2 1 1",
             "247 226 209 189 169 144 129 108 70",
             "251 240 230 219 207 192 138 89 54"),
    "PuOr": ("127 179 224 253 254 247 216 178 128 84 45",
             "59 88 130 184 224 247 218 171 115 39 0",
             "8 6 20 99 182 247 235 210 172 136 75"),
    "PuRd": ("247 231 212 201 223 231 206 152 103",
             "244 225 185 148 101 41 18 0 0",
             "249 239 218 199 176 138 86 67 31"),
    "Purples": ("252 239 218 188 158 128 106 84 63",
             "251 237 218 189 154 125 81 39 0",
             "253 245 235 220 200 186 163 143 125"),
    "RdBu": ("103 178 214 244 253 247 209 146 67 33 5",
             "0 24 96 165 219 247 229 197 147 102 48",
             "31 43 77 130 199 247 240 222 195 172 97"),
    "RdGy": ("103 178 214 244 253 255 224 186 135 77 26",
             "0 24 96 165 219 255 224 186 135 77 26",
             "31 43 77 130 199 255 224 186 135 77 26"),
    "RdPu": ("255 253 252 250 247 221 174 122 73",
             "247 224 197 159 104 52 1 1 0",
             "243 221 192 181 161 151 126 119 106"),
    "RdYlBu": ("165 215 244 253 254 255 224 171 116 69 49",
             "0 48 109 174 224 255 243 217 173 117 54",
             "38 39 67 97 144 191 248 233 209 180 149"),
    "RdYlGn": ("165 215 244 253 254 255 217 166 102 26 0",
             "0 48 109 174 224 255 239 217 189 152 104",
             "38 39 67 97 139 191 139 106 99 80 55"),
    "Reds": ("255 254 252 252 251 239 203 165 103",
             "245 224 187 146 106 59 24 15 0",
             "240 210 161 114 74 44 29 21 13"),
    "Set1": ("228 55 77 152 255 255 166 247 153",
             "26 126 175 78 127 255 86 129 153",
             "28 184 74 163 0 51 40 191 153"),
    "Set2": ("102 252 141 231 166 255 229 179",
             "194 141 160 138 216 217 196 179",
             "165 98 203 195 84 47 148 179"),
    "Set3": ("141 255 190 251 128 253 179 252 217 188 204 255",
             "211 255 186 128 177 180 222 205 217 128 235 237",
             "199 179 218 114 211 98 105 229 217 189 197 111"),
    "Spectral": ("158 213 244 253 254 255 230 171 102 50 94",
             "1 62 109 174 224 255 245 221 194 136 79",
             "66 79 67 97 139 191 152 164 165 189 162"),
    "YlGn": ("255 247 217 173 120 65 35 0 0",
             "255 252 240 221 198 171 132 104 69",
             "229 185 163 142 121 93 67 55 41"),
    "YlGnBu": ("255 237 199 127 65 29 34 37 8",
             "255 248 233 205 182 145 94 52 29",
             "217 177 180 187 196 192 168 148 88"),
    "YlOrBr": ("255 255 254 254 254 236 204 153 102",
             "255 247 227 196 153 112 76 52 37",
             "229 188 145 79 41 20 2 4 6"),
    "YlOrRd": ("255 255 254 254 253 252 227 189 128",
             "255 237 217 178 141 78 26 0 0",
             "204 160 118 76 60 42 28 38 38"),
    "cividis": ("0 0 42 72 94 114 135 158 182 208 234 255",
             "32 48 64 82 98 115 132 150 169 190 211 234",
             "77 111 108 107 110 116 121 119 113 103 87 70"),
    "gray": ("0 255",
             "0 255",
             "0 255"),
    "inferno": ("0 20 58 96 133 169 203 230 247 252 245 252",
             "0 11 9 19 33 46 65 93 131 173 219 255",
             "4 53 99 110 107 94 73 47 17 18 75 164"),
    "magma": ("0 18 51 90 125 163 200 233 249 254 254 252",
             "0 13 16 22 36 48 62 85 124 168 211 253",
             "4 50 104 126 130 126 115 98 93 115 149 191"),
    "plasma": ("13 62 99 135 166 192 213 231 245 253 252 240",
             "8 4 0 7 32 58 84 111 140 173 210 249",
             "135 156 167 166 152 131 110 90 70 50 37 33"),
    "rainbow": ("255 0 0",
             "0 255 0",
             "0 0 255"),
    "viridis": ("68 72 67 56 45 37 30 43 81 133 194 253",
             "1 33 62 89 112 133 155 176 197 213 223 231",
             "84 115 133 140 142 142 138 127 106 74 35 37"),
}


_USER_RAMPS: dict[str, tuple[str, str, str]] = {}


class ColorRampError(ValueError):
    pass


def ramp_names() -> list[str]:
    """All registered ramp names (built-in + user), plus "random"."""
    return sorted(_RAMP_DATA) + sorted(_USER_RAMPS) + ["random"]


def add_ramp(name: str, red: str, green: str, blue: str) -> None:
    """Register a user ramp: three space-separated 0-255 value strings
    of equal length (reference ``addRamp``)."""
    if name in _RAMP_DATA or name in _USER_RAMPS:
        raise ColorRampError(f"ramp {name!r} already exists")
    parts = [s.split() for s in (red, green, blue)]
    if not all(isinstance(s, str) for s in (red, green, blue)):
        raise ColorRampError("color values must be space-separated strings")
    if len({len(p) for p in parts}) != 1 or not parts[0]:
        raise ColorRampError("red/green/blue need the same number of values")
    _USER_RAMPS[name] = (red, green, blue)


def _ramp_channels(name: str) -> tuple[str, str, str]:
    try:
        return _RAMP_DATA.get(name) or _USER_RAMPS[name]
    except KeyError:
        raise ColorRampError(
            f"color ramp {name!r} not found; one of {ramp_names()}"
        ) from None


def gen_ramp_table(num_entries: int, name: str, ignore_val: int | None = None,
                   color_points=None, seed: int = 42) -> np.ndarray:
    """(num_entries, 4) uint8 RGBA table for a named ramp (reference
    ``genTable``).  ``color_points`` optionally pins the control-point
    entry numbers; ``ignore_val`` zeroes that row (transparent)."""
    ct = np.empty((num_entries, 4), dtype=np.uint8)
    if name == "random":
        rng = np.random.default_rng(seed)
        ct[:, :3] = rng.integers(0, 256, size=(num_entries, 3), dtype=np.uint8)
    else:
        channels = _ramp_channels(name)
        xinterp = np.linspace(0.0, num_entries, num_entries)
        for idx, colstr in enumerate(channels):
            yobs = np.array([float(v) for v in colstr.split()])
            if color_points is not None:
                if len(color_points) != len(yobs):
                    raise ColorRampError(
                        "color_points needs the same count as the ramp's "
                        f"control points ({len(yobs)})"
                    )
                xobs = np.asarray(color_points, dtype=np.float64)
            else:
                xobs = np.linspace(0.0, num_entries, len(yobs))
            ct[:, idx] = np.interp(xinterp, xobs, yobs)
    ct[:, 3] = 255
    if ignore_val is not None:
        ct[int(ignore_val), :] = 0
    return ct
