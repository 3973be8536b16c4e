#!/usr/bin/env python3
"""Independent Hotine Oblique Mercator variant B (EPSG method 9815) —
transcribed from EPSG Guidance Note 7-2 §3.2.7 / Snyder 1987 pp. 74-76.

Cross-check oracle for the engine's ObliqueMercator.scala: two
independently transcribed copies agreeing to ~1e-4 m pins the
projection math. Validates itself against the GN7-2 worked example
(Timbalai 1948 / RSO Borneo, EPSG 29873):
  phi = 5d23'14.1129"N, lam = 115d48'19.8196"E
  -> E = 679245.73, N = 596562.78  (meters, to the cm)
Also prints Swiss LV95 (EPSG 2056, alpha = gamma = 90 degrees) probe
points on Bessel 1841 for the spec's pinned literals.
"""
import math


def dms(d, m=0.0, s=0.0):
    sign = -1.0 if d < 0 else 1.0
    return sign * (abs(d) + m / 60.0 + s / 3600.0)


def hotine_b_forward(lat_d, lon_d, a, inv_f, latc_d, lonc_d, alphac_d,
                     gammac_d, kc, ec, nc):
    f = 1.0 / inv_f
    e2 = f * (2 - f)
    e = math.sqrt(e2)
    phic = math.radians(latc_d)
    lamc = math.radians(lonc_d)
    alphac = math.radians(alphac_d)
    gammac = math.radians(gammac_d)

    B = math.sqrt(1 + e2 * math.cos(phic) ** 4 / (1 - e2))
    A = a * B * kc * math.sqrt(1 - e2) / (1 - e2 * math.sin(phic) ** 2)

    def t_of(phi):
        s = math.sin(phi)
        return math.tan(math.pi / 4 - phi / 2) / \
            ((1 - e * s) / (1 + e * s)) ** (e / 2)

    t0 = t_of(phic)
    D = B * math.sqrt(1 - e2) / (math.cos(phic) *
                                 math.sqrt(1 - e2 * math.sin(phic) ** 2))
    D2 = max(D * D, 1.0)
    F = D + math.copysign(math.sqrt(D2 - 1), phic)
    H = F * t0 ** B
    G = (F - 1 / F) / 2
    gamma0 = math.asin(math.sin(alphac) / D)
    lam0 = lamc - math.asin(G * math.tan(gamma0)) / B

    # u at the projection centre (variant B offsets u by this)
    if abs(alphac_d - 90.0) < 1e-12:
        uc = A * (lamc - lam0)
    else:
        uc = (A / B) * math.atan2(math.sqrt(D2 - 1), math.cos(alphac)) * \
            math.copysign(1.0, phic)

    phi = math.radians(lat_d)
    lam = math.radians(lon_d)
    t = t_of(phi)
    Q = H / t ** B
    S = (Q - 1 / Q) / 2
    T = (Q + 1 / Q) / 2
    V = math.sin(B * (lam - lam0))
    U = (-V * math.cos(gamma0) + S * math.sin(gamma0)) / T
    v = A * math.log((1 - U) / (1 + U)) / (2 * B)
    u = A * math.atan2(S * math.cos(gamma0) + V * math.sin(gamma0),
                       math.cos(B * (lam - lam0))) / B
    u -= abs(uc) * math.copysign(1.0, phic)

    E = v * math.cos(gammac) + u * math.sin(gammac) + ec
    N = u * math.cos(gammac) - v * math.sin(gammac) + nc
    return E, N


def main():
    # GN7-2 worked example: Timbalai 1948 / RSO Borneo (m)
    a, inv_f = 6377298.556, 300.8017
    latc, lonc = dms(4), dms(115)
    alphac = dms(53, 18, 56.9537)
    gammac = dms(53, 7, 48.3685)
    kc, ec, nc = 0.99984, 590476.87, 442857.65
    lat = dms(5, 23, 14.1129)
    lon = dms(115, 48, 19.8196)
    E, N = hotine_b_forward(lat, lon, a, inv_f, latc, lonc, alphac,
                            gammac, kc, ec, nc)
    print(f"Timbalai test point: E={E:.4f} N={N:.4f} "
          f"(EPSG: 679245.73, 596562.78)")
    Ec2, Nc2 = hotine_b_forward(latc, lonc, a, inv_f, latc, lonc, alphac,
                                gammac, kc, ec, nc)
    print(f"Timbalai centre anchor: E={Ec2:.6f} N={Nc2:.6f} "
          f"(expect 590476.87, 442857.65)")

    # Swiss LV95 (CH1903+ datum, Bessel 1841), native-datum probes
    a, inv_f = 6377397.155, 299.1528128
    latc = dms(46, 57, 8.66)
    lonc = dms(7, 26, 22.5)
    for (lat, lon) in [(latc, lonc), (47.0, 8.0), (46.2, 6.15),
                       (47.4, 9.4)]:
        E, N = hotine_b_forward(lat, lon, a, inv_f, latc, lonc,
                                90.0, 90.0, 1.0, 2600000.0, 1200000.0)
        print(f"LV95 ({lat:.6f}, {lon:.6f}) -> E={E:.4f} N={N:.4f}")


if __name__ == "__main__":
    main()
