#!/usr/bin/env python3
"""Independent cross-check for graft.geo.NationalGrids.

Transverse Mercator via the classic Snyder 1987 series (eqs. 8-9..8-17,
4-GK meridian arc) -- a DIFFERENT formulation from the Scala side's
Karney n-series -- composed with the same published position-vector
Helmert parameters. Agreement to ~1e-3 m over the grids' domains
catches transcription errors in either implementation (the same
methodology as tools/conic_snyder.py / utm_snyder.py).

Run: python3 tools/tm_datum_check.py
Prints pinned (srid, lat, lon) -> (E, N) rows used by NationalGridSpec
and SparkEntry q134.
"""
import math

GRIDS = {
    # srid: (a, 1/f, lat0, lon0, k0, FE, FN, helmert source->WGS84 or None)
    27700: (6377563.396, 299.3249646, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
            (446.448, -125.157, 542.060, 0.1502, 0.2470, 0.8421, -20.4894)),
    29902: (6377340.189, 299.3249646, 53.5, -8.0, 1.000035, 200000.0, 250000.0,
            (482.5, -130.6, 564.6, -1.042, -0.214, -0.631, 8.15)),
    2157: (6378137.0, 298.257222101, 53.5, -8.0, 0.99982, 600000.0, 750000.0, None),
    23031: (6378388.0, 297.0, 0.0, 3.0, 0.9996, 500000.0, 0.0,
            (-87.0, -96.0, -120.0, 0.0, 0.0, 0.0, 0.0)),
}
WGS84 = (6378137.0, 298.257223563)


def meridian_arc(a, e2, phi):
    # Snyder 3-21
    e4, e6 = e2 * e2, e2 * e2 * e2
    return a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
                - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
                + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
                - (35 * e6 / 3072) * math.sin(6 * phi))


def tm_forward(a, invf, lat0, lon0, k0, fe, fn, lat, lon):
    # Snyder 8-9..8-13
    f = 1.0 / invf
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    phi = math.radians(lat)
    dlam = math.radians(lon - lon0)
    sp, cp = math.sin(phi), math.cos(phi)
    N = a / math.sqrt(1 - e2 * sp * sp)
    T = (sp / cp) ** 2
    C = ep2 * cp * cp
    A = dlam * cp
    M = meridian_arc(a, e2, phi)
    M0 = meridian_arc(a, e2, math.radians(lat0))
    E = fe + k0 * N * (A + (1 - T + C) * A ** 3 / 6
                       + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A ** 5 / 120)
    Nn = fn + k0 * (M - M0 + N * sp / cp * (A * A / 2
                    + (5 - T + 9 * C + 4 * C * C) * A ** 4 / 24
                    + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A ** 6 / 720))
    return E, Nn


def to_geocentric(a, invf, lat, lon):
    f = 1.0 / invf
    e2 = f * (2 - f)
    phi, lam = math.radians(lat), math.radians(lon)
    s = math.sin(phi)
    nu = a / math.sqrt(1 - e2 * s * s)
    return (nu * math.cos(phi) * math.cos(lam),
            nu * math.cos(phi) * math.sin(lam),
            nu * (1 - e2) * s)


def to_geodetic(a, invf, x, y, z):
    f = 1.0 / invf
    e2 = f * (2 - f)
    p = math.hypot(x, y)
    lat = math.atan2(z, p * (1 - e2))
    for _ in range(12):
        s = math.sin(lat)
        nu = a / math.sqrt(1 - e2 * s * s)
        lat = math.atan2(z + e2 * nu * s, p)
    return math.degrees(lat), math.degrees(math.atan2(y, x))


def helmert_fwd(par, x, y, z):
    tx, ty, tz, rxs, rys, rzs, ppm = par
    sec = math.pi / (180 * 3600)
    rx, ry, rz = rxs * sec, rys * sec, rzs * sec
    m = 1.0 + ppm * 1e-6
    return (tx + m * (x - rz * y + ry * z),
            ty + m * (rz * x + y - rx * z),
            tz + m * (-ry * x + rx * y + z))


def helmert_rev(par, xp, yp, zp):
    # exact inverse of the forward operator, found by fixed-point
    # iteration X <- (X' - T)/m - S.X (a different method from the
    # Scala side's closed-form 3x3 inverse -- keeps the check independent)
    tx, ty, tz, rxs, rys, rzs, ppm = par
    sec = math.pi / (180 * 3600)
    rx, ry, rz = rxs * sec, rys * sec, rzs * sec
    m = 1.0 + ppm * 1e-6
    ux, uy, uz = (xp - tx) / m, (yp - ty) / m, (zp - tz) / m
    x, y, z = ux, uy, uz
    for _ in range(8):
        x = ux - (-rz * y + ry * z)
        y = uy - (rz * x - rx * z)
        z = uz - (-ry * x + rx * y)
    return x, y, z


def wgs84_to_grid(srid, lat, lon):
    a, invf, lat0, lon0, k0, fe, fn, par = GRIDS[srid]
    if par is not None:
        x, y, z = to_geocentric(*WGS84, lat, lon)
        x, y, z = helmert_rev(par, x, y, z)
        lat, lon = to_geodetic(a, invf, x, y, z)
    return tm_forward(a, invf, lat0, lon0, k0, fe, fn, lat, lon)


if __name__ == "__main__":
    # (srid, WGS84 lat, lon): London, Edinburgh, Cardiff / Dublin spire
    # (both Irish grids) / Barcelona (ED50 UTM 31N)
    points = [
        (27700, 51.5074, -0.1278),
        (27700, 55.9533, -3.1883),
        (27700, 51.4816, -3.1791),
        (29902, 53.34979, -6.26031),
        (2157, 53.34979, -6.26031),
        (23031, 41.3874, 2.1686),
    ]
    for srid, lat, lon in points:
        e, n = wgs84_to_grid(srid, lat, lon)
        print(f"({lat}D, {lon}D, {srid}, {e:.4f}D, {n:.4f}D),")
    # projection-only worked example (OS guide annexe): OSGB36 geodetic
    a, invf, lat0, lon0, k0, fe, fn, _ = GRIDS[27700]
    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    e, n = tm_forward(a, invf, lat0, lon0, k0, fe, fn, lat, lon)
    print(f"OS worked example: E={e:.4f} N={n:.4f} (published 651409.903, 313177.270)")
