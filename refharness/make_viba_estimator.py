"""Generate the VIBA-enabled variant of the reference Estimator.

VERDICT r5 item 4 (level-field experiment): the reference implements
RunVIBA but disables the call in its own keyframe path "for debugging"
(/root/reference/src/processing/Estimator.cpp:768-786 — the call and
the bias re-propagation are commented out, and visual-only RunLocalBA
runs instead). To compare vio360_tpu's ENABLED VIBA against what the
reference WOULD do with its own inertial BA turned on, this script
re-activates exactly that commented block — nothing else — writing the
patched file into the build tree (the reference tree is never touched).

Usage: python make_viba_estimator.py SRC OUT
"""

import sys

START = "// Visual-only BA for now (VIBA disabled for debugging)"
END = "// UpdatePreintegrationsWithNewBias(new_gyro_bias, new_accel_bias);"

ENABLED = """// [ref_harness_viba] the reference's own commented-out VIBA
            // path (Estimator.cpp:768-786), re-enabled verbatim:
            // Visual-Inertial BA after IMU initialization
            ba_result = optimizer.RunVIBA(m_keyframes, m_gravity, true);

            // Get updated bias from last keyframe
            auto last_kf = m_keyframes.back();
            Eigen::Vector3f new_gyro_bias = last_kf->GetGyroBias();
            Eigen::Vector3f new_accel_bias = last_kf->GetAccelBias();

            LOG_INFO("VIBA KF{}: bg=[{:.6f},{:.6f},{:.6f}] ba=[{:.6f},{:.6f},{:.6f}]",
                     last_kf->GetFrameId(),
                     new_gyro_bias.x(), new_gyro_bias.y(), new_gyro_bias.z(),
                     new_accel_bias.x(), new_accel_bias.y(), new_accel_bias.z());

            // Update all preintegrations with new bias
            UpdatePreintegrationsWithNewBias(new_gyro_bias, new_accel_bias);"""


def main() -> int:
    src, out = sys.argv[1], sys.argv[2]
    text = open(src).read()
    i = text.find(START)
    j = text.find(END, i)
    if i < 0 or j < 0:
        sys.stderr.write(
            "make_viba_estimator: disabled-VIBA block not found in "
            f"{src} — reference layout changed?\n"
        )
        return 1
    j += len(END)
    block = text[i:j]
    # sanity: the span must contain exactly the disabled calls we expect
    for marker in (
        "ba_result = optimizer.RunLocalBA(m_keyframes);",
        "// ba_result = optimizer.RunVIBA(m_keyframes, m_gravity, true);",
    ):
        if marker not in block:
            sys.stderr.write(
                f"make_viba_estimator: marker missing in block: {marker}\n"
            )
            return 1
    open(out, "w").write(text[:i] + ENABLED + text[j:])
    return 0


if __name__ == "__main__":
    sys.exit(main())
