"""Minimal pyquaternion.Quaternion stand-in for running the REFERENCE parser
as a golden-test oracle (pyquaternion is not installed in this image).

Implements only the surface the reference uses (mocap_util.py /
mocap_v2.py): ctor from (w,x,y,z) or matrix=, `conjugate`, `*`, `elements`,
`axis`, `angle` — with pyquaternion's exact conventions (angle wrapped into
(-pi, pi], axis zero for identity).
"""
import numpy as np


class Quaternion:
    def __init__(self, *args, matrix=None):
        if matrix is not None:
            self.q = self._from_matrix(np.asarray(matrix, dtype=np.float64))
        elif len(args) == 1:
            self.q = np.asarray(args[0], dtype=np.float64).copy()
        else:
            self.q = np.array(args, dtype=np.float64)

    @staticmethod
    def _from_matrix(m):
        # Shepperd's method (same result as pyquaternion for rotation matrices)
        t = np.trace(m)
        if t > 0:
            r = np.sqrt(1.0 + t)
            s = 0.5 / r
            return np.array(
                [0.5 * r, (m[2, 1] - m[1, 2]) * s, (m[0, 2] - m[2, 0]) * s,
                 (m[1, 0] - m[0, 1]) * s]
            )
        i = int(np.argmax(np.diag(m)))
        j, k = (i + 1) % 3, (i + 2) % 3
        r = np.sqrt(1.0 + m[i, i] - m[j, j] - m[k, k])
        s = 0.5 / r
        q = np.empty(4)
        q[0] = (m[k, j] - m[j, k]) * s
        q[1 + i] = 0.5 * r
        q[1 + j] = (m[j, i] + m[i, j]) * s
        q[1 + k] = (m[k, i] + m[i, k]) * s
        return q

    @property
    def conjugate(self):
        w, x, y, z = self.q
        return Quaternion(w, -x, -y, -z)

    def __mul__(self, other):
        w1, x1, y1, z1 = self.q
        w2, x2, y2, z2 = other.q
        return Quaternion(
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        )

    @property
    def elements(self):
        return self.q.copy()

    @property
    def _normalised(self):
        return Quaternion(self.q / np.linalg.norm(self.q))

    @property
    def angle(self):
        w = np.clip(self._normalised.q[0], -1.0, 1.0)
        theta = 2.0 * np.arccos(w)
        # pyquaternion _wrap_angle: into (-pi, pi], with -pi -> pi
        result = ((theta + np.pi) % (2 * np.pi)) - np.pi
        if result == -np.pi:
            result = np.pi
        return result

    @property
    def axis(self):
        v = self._normalised.q[1:]
        n = np.linalg.norm(v)
        if n < 1e-12:
            return np.zeros(3)
        return v / n
