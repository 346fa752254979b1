"""Tests for gait segmentation on a synthetic lateral-walk trial.

Builds a force-plate Fz pair encoding the reference experiment's
structure — a single-support lead-in, then 4 passes (trechos) of
8 alternating double/single-support phases plus a 9th closing phase,
separated by single-support gaps — and checks transition detection,
phase ordering and (frame, subframe) slice queries.
"""

import numpy as np
import pytest

from muscle_synergies_tpu import DeviceData, DeviceType, SamplingFreq, ViconNexusData
from muscle_synergies_tpu.frames import ForcesEMGFrameTracker, TrajFrameTracker
from muscle_synergies_tpu.segment import (
    Cycle,
    Phase,
    Segmenter,
    SegmentPlotter,
    Trecho,
    reactions,
    transition_indices,
)

STATE_LEN = 20  # samples per support state

# support states: L = left only, R = right only, B = both
LEAD = ["L"]
TRECHO = ["B", "L", "B", "R", "B", "L", "B", "R", "B"]
GAP = ["L"]
SEQUENCE = LEAD + (TRECHO + GAP) * 4


def _trecho_states(n_cycles):
    """One pass: alternating B/single states, 4 per cycle + closing B."""
    states = []
    for c in range(n_cycles):
        single = "L" if c % 2 == 0 else "R"
        other = "R" if c % 2 == 0 else "L"
        states += ["B", single, "B", other]
    return states + ["B"]


def _sequence(n_trechos, n_cycles):
    return LEAD + (_trecho_states(n_cycles) + GAP) * n_trechos


def _fz_signals(sequence=SEQUENCE):
    left, right = [], []
    for state in sequence:
        left += [-100.0 if state in "LB" else 0.0] * STATE_LEN
        right += [-50.0 if state in "RB" else 0.0] * STATE_LEN
    return np.array(left), np.array(right)


def _capture(sequence=SEQUENCE):
    left, right = _fz_signals(sequence)
    n = len(left)
    # fast rate 300 Hz, slow 100 Hz -> 3 subframes; pad to full frames
    pad = (-n) % 3
    left = np.pad(left, (0, pad))
    right = np.pad(right, (0, pad))
    n = len(left)
    sf = SamplingFreq(300, 100, num_frames=n // 3)
    fast = ForcesEMGFrameTracker(sf)
    slow = TrajFrameTracker(sf)

    def plate(name, fz):
        return DeviceData(
            name, DeviceType.FORCE_PLATE, ("N",), fast,
            array=fz[:, None], coords=("Fz",),
        )

    emg = DeviceData(
        "EMG", DeviceType.EMG, ("V",), fast,
        array=np.zeros((n, 2)), coords=("E1", "E2"),
    )
    marker = DeviceData(
        "M:1", DeviceType.TRAJECTORY_MARKER, ("mm",) * 3, slow,
        array=np.zeros((n // 3, 3)), coords=("X", "Y", "Z"),
    )
    return ViconNexusData(
        [plate("Left", left), plate("Right", right)], emg, [marker], sf
    )


@pytest.fixture(scope="module")
def capture():
    return _capture()


@pytest.fixture(scope="module")
def segmenter(capture):
    return Segmenter(capture)


class TestTransitionIndices:
    def test_finds_40_transitions_at_state_boundaries(self, capture):
        left, right = reactions(capture)
        idx = transition_indices(left, right)
        assert len(idx) == 40
        assert idx[0] == 0
        assert all(i % STATE_LEN == 0 for i in idx)
        # consecutive transitions are one state apart
        assert all(b - a == STATE_LEN for a, b in zip(idx, idx[1:]))

    def test_num_segments_zero_finds_all(self, capture):
        left, right = reactions(capture)
        idx = transition_indices(left, right, num_segments=0)
        assert len(idx) >= 40

    def test_truncated_signal_raises(self, capture):
        left, right = reactions(capture)
        with pytest.raises(ValueError, match="transitions"):
            transition_indices(left[:200], right[:200])

    def test_debounce_skips_glitches(self):
        # a 3-sample double-support glitch inside single support must
        # not register as a transition
        left = np.full(200, -100.0)
        right = np.zeros(200)
        right[50:53] = -50.0
        right[100:] = -50.0
        idx = transition_indices(left, right, num_segments=2)
        assert idx == [0, 100]


class TestSegmenter:
    def test_phase_order_trecho1(self, segmenter):
        # second phase is left-only -> swing -> wide-start ordering
        assert segmenter.ith_phase(1, 1) is Phase.DAA
        assert segmenter.ith_phase(1, 2) is Phase.BL
        assert segmenter.ith_phase(1, 3) is Phase.DAE
        assert segmenter.ith_phase(1, 4) is Phase.AS

    def test_phase_order_trecho2(self, segmenter):
        assert segmenter.ith_phase(2, 1) is Phase.DAE
        assert segmenter.ith_phase(Trecho.SECOND, 2) is Phase.BL

    def test_ith_phase_validation(self, segmenter):
        with pytest.raises(IndexError):
            segmenter.ith_phase(1, 0)
        with pytest.raises(IndexError):
            segmenter.ith_phase(1, 5)

    def test_phase_slice_frames(self, segmenter, capture):
        # trecho 1, cycle 1, phase BL = samples 40..59
        seg = segmenter.get_times_of(1, 1, "BL")
        dev = capture.forcepl[0]
        assert dev.to_index(seg.start) == 40
        assert dev.to_index(seg.stop) == 59

    def test_phase_by_position_matches_by_name(self, segmenter):
        by_name = segmenter.get_times_of(1, 1, "BL")
        by_pos = segmenter.get_times_of(1, 1, 2)
        assert by_name == by_pos

    def test_cycle_slice_spans_phases(self, segmenter, capture):
        seg = segmenter.get_times_of(1, 1)
        dev = capture.forcepl[0]
        assert dev.to_index(seg.start) == STATE_LEN  # first B state
        assert dev.to_index(seg.stop) == 5 * STATE_LEN - 1

    def test_trecho_slice_spans_cycles(self, segmenter, capture):
        seg = segmenter.get_times_of(1)
        dev = capture.forcepl[0]
        assert dev.to_index(seg.start) == STATE_LEN
        # trecho ends right before its 9th phase
        assert dev.to_index(seg.stop) == 9 * STATE_LEN - 1

    def test_tuple_argument_form(self, segmenter):
        assert segmenter.get_times_of((1, 1, "BL")) == segmenter.get_times_of(
            1, 1, "BL"
        )
        assert segmenter.get_times_of((2, 2)) == segmenter.get_times_of(2, 2)

    def test_arg_validation(self, segmenter):
        with pytest.raises(ValueError, match="cycle"):
            segmenter.get_times_of(1, None, "BL")
        with pytest.raises(ValueError, match="omitted"):
            segmenter.get_times_of((1, 1, "BL"), 1)

    def test_slices_index_device_data(self, segmenter, capture):
        seg = segmenter.get_times_of(1, 1, "BL")
        rows = capture.forcepl[0][seg]
        # BL = left-only support: left plate loaded over the whole span
        assert (rows["Fz"] == -100.0).all()

    def test_second_cycle_follows_first(self, segmenter, capture):
        dev = capture.forcepl[0]
        c1 = segmenter.get_times_of(1, 1)
        c2 = segmenter.get_times_of(1, 2)
        assert dev.to_index(c2.start) == dev.to_index(c1.stop) + 1


class TestCustomProtocol:
    """Segmenter generalizes past the reference's fixed 4x2 layout."""

    @pytest.fixture(scope="class")
    def capture33(self):
        return _capture(_sequence(n_trechos=3, n_cycles=3))

    @pytest.fixture(scope="class")
    def segmenter33(self, capture33):
        return Segmenter(capture33, n_trechos=3, n_cycles=3)

    def test_int_keys_and_counts(self, segmenter33):
        segs = segmenter33.segments
        assert list(segs.keys()) == [1, 2, 3]
        for cycles in segs.values():
            assert list(cycles.keys()) == [1, 2, 3]
            for phases in cycles.values():
                assert len(phases) == 4

    def test_phase_slices_consecutive(self, segmenter33, capture33):
        dev = capture33.forcepl[0]
        c1 = segmenter33.get_times_of(1, 1)
        c2 = segmenter33.get_times_of(1, 2)
        c3 = segmenter33.get_times_of(1, 3)
        assert dev.to_index(c2.start) == dev.to_index(c1.stop) + 1
        assert dev.to_index(c3.start) == dev.to_index(c2.stop) + 1
        # first trecho starts after the single-support lead-in
        assert dev.to_index(c1.start) == STATE_LEN

    def test_trecho_slice_spans_all_cycles(self, segmenter33, capture33):
        dev = capture33.forcepl[0]
        whole = segmenter33.get_times_of(2)
        c1 = segmenter33.get_times_of(2, 1)
        c3 = segmenter33.get_times_of(2, 3)
        assert whole.start == c1.start and whole.stop == c3.stop

    def test_out_of_range_raises(self, segmenter33):
        with pytest.raises(IndexError, match="trecho"):
            segmenter33.get_times_of(4, 1)
        with pytest.raises(IndexError, match="cycle"):
            segmenter33.get_times_of(1, 4)

    def test_enum_args_still_accepted(self, segmenter33):
        # Trecho/Cycle enums map onto their ordinals for custom counts
        assert segmenter33.get_times_of(
            Trecho.SECOND, Cycle.FIRST
        ) == segmenter33.get_times_of(2, 1)

    def test_default_counts_reject_bad_ints(self, segmenter):
        with pytest.raises(IndexError, match="trecho"):
            segmenter.get_times_of(5)
        with pytest.raises(IndexError, match="cycle"):
            segmenter.get_times_of(1, 3)

    def test_bad_protocol_rejected(self, capture33):
        with pytest.raises(ValueError, match="at least 1"):
            Segmenter(capture33, n_trechos=0)

    def test_phase_summary_on_custom_protocol(self, capture33, segmenter33):
        from muscle_synergies_tpu.segment import phase_summary

        summary = phase_summary(capture33, segmenter33)
        assert len(summary) == 3 * 3 * 4
        assert set(summary["trecho"]) == {1, 2, 3}
        assert set(summary["cycle"]) == {1, 2, 3}


class TestSegmentPlotter:
    def test_plot_reactions_and_segment(self, capture, segmenter):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, ax = plotter.plot_reactions(show=False)
        plt.close(fig)
        fig, ax = plotter.plot_segment(1, 1, "BL", show=False)
        plt.close(fig)


class TestRegressionFixes:
    """Round-2 review fixes: per-cycle phase order, tail debounce."""

    def test_phase_labels_match_support_in_alternating_cycles(self):
        """Each cycle's BL/AS labels must reflect its own loaded plate.

        The custom synthetic alternates the swing leg per cycle; a
        per-pass phase order (derived only from cycle 1) mislabels
        every phase of the even cycles.
        """
        capture = _capture(_sequence(n_trechos=2, n_cycles=3))
        seg = Segmenter(capture, n_trechos=2, n_cycles=3)
        left = np.asarray(capture.forcepl[0].df.iloc[:, 0])
        right = np.asarray(capture.forcepl[1].df.iloc[:, 0])
        dev = capture.forcepl[0]
        for trecho in (1, 2):
            for cycle in (1, 2, 3):
                for phase, want in (("BL", "left"), ("AS", "right")):
                    sl = seg.get_times_of(trecho, cycle, phase)
                    mid = (dev.to_index(sl.start) + dev.to_index(sl.stop)) // 2
                    if want == "left":
                        assert left[mid] != 0 and right[mid] == 0, (
                            trecho, cycle, phase)
                    else:
                        assert right[mid] != 0 and left[mid] == 0, (
                            trecho, cycle, phase)

    def test_tail_glitch_not_accepted_as_debounced(self):
        """A sub-window glitch in the final samples must not count."""
        left = np.full(200, -100.0)
        right = np.zeros(200)
        right[-2:] = -50.0  # 2-sample ringing at the very end
        with pytest.raises(ValueError, match="no phase found"):
            transition_indices(left, right, min_phase_size=10,
                               num_segments=2)


class TestSegmentPlotterParity:
    """Reference plotting surface: rectangles, focused xlim, grids.

    Mirrors reference project/segment.py:329-664 — patch extents are
    asserted on the Agg backend per axes.
    """

    @pytest.fixture(autouse=True)
    def _agg(self):
        import matplotlib

        matplotlib.use("Agg")

    def _rects(self, ax):
        from matplotlib import patches

        return [p for p in ax.patches if isinstance(p, patches.Rectangle)]

    def test_plot_segment_draws_rectangle_with_segment_extent(
        self, capture, segmenter
    ):
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, ax = plotter.plot_segment(1, 1, "BL", show=False)
        rects = self._rects(ax)
        assert len(rects) == 1
        begin, end = plotter._get_times_in_seconds("fp", (1, 1, "BL"))
        r = rects[0]
        assert r.get_x() == pytest.approx(begin)
        assert r.get_width() == pytest.approx(end - begin)
        # y extent spans the axes' y-limits at draw time
        y0, y1 = ax.get_ylim()
        assert r.get_y() <= y0 and r.get_y() + r.get_height() >= y1 - 1e-9
        plt.close(fig)

    def test_device_first_reference_call_shape(self, capture, segmenter):
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, ax = plotter.plot_segment(
            "fp",
            "Fz",
            time=(1, 2),
            rectangle_label="cycle 2",
            show=False,
            show_legend=True,
        )
        rects = self._rects(ax)
        assert len(rects) == 1
        begin, end = plotter._get_times_in_seconds("fp", (1, 2))
        assert rects[0].get_x() == pytest.approx(begin)
        assert rects[0].get_width() == pytest.approx(end - begin)
        labels = [t.get_text() for t in ax.get_legend().get_texts()]
        assert "cycle 2" in labels
        plt.close(fig)

    def test_time_none_draws_no_rectangle(self, capture, segmenter):
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, ax = plotter.plot_segment("fp", "Fz", show=False)
        assert self._rects(ax) == []
        plt.close(fig)

    def test_focused_xlim_thirty_pct_margin(self, capture, segmenter):
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, ax = plotter.plot_segment(
            "fp", "Fz", time=(2, 1, "BL"), show=False, show_entire=False
        )
        t0, t1 = plotter._get_times_in_seconds("fp", 2)  # the trecho
        margin = (t1 - t0) * 0.3
        x0, x1 = ax.get_xlim()
        assert x0 == pytest.approx(t0 - margin)
        assert x1 == pytest.approx(t1 + margin)
        plt.close(fig)

    def test_plot_segment_og_rectangle_and_legend(self, capture, segmenter):
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, ax = plotter.plot_segment_og(
            "first pass", trecho=1, y_min=-120.0, y_max=0.0, show=False
        )
        rects = self._rects(ax)
        assert len(rects) == 1
        begin, end = plotter._get_times_in_seconds("fp", (1, None, None))
        r = rects[0]
        assert r.get_x() == pytest.approx(begin)
        assert r.get_width() == pytest.approx(end - begin)
        assert r.get_y() == pytest.approx(-120.0)
        assert r.get_height() == pytest.approx(120.0)
        labels = [t.get_text() for t in ax.get_legend().get_texts()]
        assert "first pass" in labels
        plt.close(fig)

    def test_plot_segment_og_focused(self, capture, segmenter):
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, ax = plotter.plot_segment_og(
            "pass 2", trecho=2, show=False, show_entire=False
        )
        t0, t1 = plotter._get_times_in_seconds("fp", 2)
        margin = (t1 - t0) * 0.3
        assert ax.get_xlim() == pytest.approx((t0 - margin, t1 + margin))
        plt.close(fig)

    def test_grid_one_axes_per_device_each_shaded(self, capture, segmenter):
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, axes = plotter.plot_segment_grid(
            "fp", "Fz", time=(1, 1), rectangle_label="c1", show=False
        )
        assert len(axes) == 2  # both force plates
        begin, end = plotter._get_times_in_seconds("fp", (1, 1))
        for ax in axes:
            rects = self._rects(ax)
            assert len(rects) == 1
            assert rects[0].get_x() == pytest.approx(begin)
            assert rects[0].get_width() == pytest.approx(end - begin)
            # each rectangle sized from ITS axes' y-limits
            y0, y1 = ax.get_ylim()
            assert rects[0].get_y() == pytest.approx(y0)
            assert rects[0].get_height() == pytest.approx(y1 - y0)
        plt.close(fig)

    def test_grid_emg_single_axes(self, capture, segmenter):
        import matplotlib.pyplot as plt

        plotter = SegmentPlotter(capture, segmenter)
        fig, axes = plotter.plot_segment_grid(
            "emg", "E1", time=1, show=False
        )
        assert len(axes) == 1
        assert len(self._rects(axes[0])) == 1
        plt.close(fig)
