"""The assembly graph: segments keyed by signed integers, GFA round-trip,
and the full graph-operation set of the reference pipeline.

Capability parity with reference unicycler/assembly_graph.py:43-2371 (the
2688-line core data structure). Graph topology operations are host-side by
design — graphs are thousands of nodes and the algorithms are sequential
with order-dependent output (SURVEY.md §7 hard parts: "resist the urge to
parallelise where order affects output"). Sequence-heavy work (path
scoring, alignment) batches to device through ops/.

Method-by-method behavior (including sorted iteration orders and arbitrary
tie-break rules) matches the reference so graph outputs are equivalent;
the implementation is original.
"""

import copy
import itertools
import math
import os
from collections import defaultdict, deque

from .. import log, settings
from ..misc import (add_line_breaks_to_sequence, float_to_str, int_to_str,
                    print_table, score_function, weighted_average_list)
from .gfa import (add_to_bridged_sets, all_segments_are_one_base,
                  build_rc_links_if_necessary, build_reverse_links,
                  find_replace_in_list, find_replace_one_val_in_list,
                  get_overlap_from_gfa_link, get_sign_string,
                  insert_num_in_list, int_to_signed_string, is_link_positive,
                  remove_dupes_preserve_order, signed_string_to_int,
                  split_path_multiple, value_from_fractional_index)
from .segment import Segment


class CannotTrimOverlaps(Exception):
    pass


class BadPath(Exception):
    pass


class BadOverlaps(Exception):
    pass


class AssemblyGraph(object):
    """An assembly graph loaded from GFA: segments (unsigned int keys),
    signed-int link dicts, SPAdes paths, copy depths and overlap size."""

    def __init__(self, filename, overlap, insert_size_mean=250,
                 insert_size_deviation=50):
        self.segments = {}          # unsigned num -> Segment
        self.forward_links = {}     # signed num -> [signed num]
        self.reverse_links = {}     # signed num <- [signed num]
        self.copy_depths = {}       # unsigned num -> [copy depths]
        self.manual_multiplicity = {}   # unsigned num -> int (ML tags)
        self.paths = {}             # path name -> [signed nums]
        self.overlap = overlap
        self.insert_size_mean = insert_size_mean
        self.insert_size_deviation = insert_size_deviation
        if filename.endswith('.fastg'):
            self.load_from_fastg(filename)
            if not overlap:
                self.overlap = self._infer_fastg_overlap()
        else:
            self.load_from_gfa(filename)
            if not overlap:
                self.overlap = get_overlap_from_gfa_link(filename)

    # ------------------------------------------------------------------
    # GFA IO (ref assembly_graph.py:64-117, 238-314)
    # ------------------------------------------------------------------

    def load_from_gfa(self, filename):
        with open(filename, 'rt') as gfa_file:
            for line in gfa_file:
                if line.startswith('S'):
                    parts = line.strip().split('\t')
                    num = int(parts[1])
                    depth = 1.0
                    for part in parts:
                        if part.lower().startswith('dp:'):
                            depth = float(part[5:])
                        if part.lower().startswith('ml:'):
                            self.manual_multiplicity[num] = int(part[5:])
                    self.segments[num] = Segment(num, depth, parts[2], True)
                    self.segments[num].build_other_sequence_if_necessary()
                elif line.startswith('i'):
                    parts = line.strip().split('\t')
                    try:
                        self.insert_size_mean = float(parts[1])
                        self.insert_size_deviation = float(parts[2])
                    except (ValueError, IndexError):
                        pass
        with open(filename, 'rt') as gfa_file:
            for line in gfa_file:
                if line.startswith('L'):
                    parts = line.strip().split('\t')
                    start = signed_string_to_int(parts[1] + parts[2])
                    end = signed_string_to_int(parts[3] + parts[4])
                    self.forward_links.setdefault(start, []).append(end)
        self.forward_links = build_rc_links_if_necessary(self.forward_links)
        self.reverse_links = build_reverse_links(self.forward_links)
        self.sort_link_order()
        with open(filename, 'rt') as gfa_file:
            for line in gfa_file:
                if line.startswith('P'):
                    parts = line.strip().split('\t')
                    segs = [signed_string_to_int(x)
                            for x in parts[2].split(',')]
                    if len(segs) > 1:
                        self.paths[parts[1]] = segs

    def load_from_fastg(self, filename):
        """SPAdes FASTG ingestion (header grammar of ref
        assembly_graph.py:2374-2463): EDGE headers carry segment number,
        depth and outgoing links; a sibling SPAdes paths file
        (`<name>.paths` or `contigs.paths`) supplies the contig paths
        the spades-contig bridges consume. The GFA fixture converted
        from the same assembly pins equivalence
        (tests/test_fastg_ingest.py)."""
        from .gfa import (get_depth_from_header, get_links_from_header,
                          get_signed_number_from_header)
        headers = []
        header, seq_parts = None, []
        with open(filename, 'rt') as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                if line[0] == '>':
                    if header is not None:
                        headers.append((header, ''.join(seq_parts)))
                    header, seq_parts = line[1:], []
                else:
                    seq_parts.append(line)
        if header is not None:
            headers.append((header, ''.join(seq_parts)))
        for header, seq in headers:
            num = get_signed_number_from_header(header)
            if abs(num) in self.segments:
                continue
            seg = Segment(abs(num), get_depth_from_header(header), seq,
                          num > 0)
            seg.build_other_sequence_if_necessary()
            self.segments[abs(num)] = seg
        for header, _ in headers:
            start, ends = get_links_from_header(header)
            for end in ends:
                links = self.forward_links.setdefault(start, [])
                if end not in links:
                    links.append(end)
        self.forward_links = build_rc_links_if_necessary(self.forward_links)
        self.reverse_links = build_reverse_links(self.forward_links)
        self.sort_link_order()
        for paths_file in (filename + '.paths',
                           os.path.join(os.path.dirname(filename) or '.',
                                        'contigs.paths')):
            if os.path.isfile(paths_file):
                self.load_spades_paths(paths_file)
                break

    def load_spades_paths(self, paths_filename):
        """SPAdes contigs.paths: alternating name line / comma-separated
        signed-edge line; reverse-strand entries (name ending with ')
        are skipped; scaffold gaps (';') split the path into suffixed
        pieces, the naming save_to_gfa uses for split paths."""
        with open(paths_filename, 'rt') as f:
            lines = [ln.strip() for ln in f if ln.strip()]
        for name_line, path_line in zip(lines[::2], lines[1::2]):
            if name_line.endswith("'"):
                continue
            pieces = [p for p in path_line.split(';') if p]
            for i, piece in enumerate(pieces):
                name = name_line if len(pieces) == 1 \
                    else '%s_%d' % (name_line, i + 1)
                segs = [signed_string_to_int(x) for x in piece.split(',')]
                if len(segs) > 1:
                    self.paths[name] = segs

    def _infer_fastg_overlap(self):
        """FASTG states no overlap size; SPAdes graphs use a uniform
        k-1 overlap baked into the edge sequences. Infer it as the
        largest size on which every link's end-of-start equals
        start-of-end (0 when the graph has no links)."""
        pairs = [(s, e) for s, ends in self.forward_links.items()
                 for e in ends]
        if not pairs:
            return 0
        max_o = min(min(self.seq_from_signed_seg_num(s).__len__(),
                        self.seq_from_signed_seg_num(e).__len__())
                    for s, e in pairs) - 1
        max_o = min(max_o, 1000)
        for o in range(max_o, 0, -1):
            ok = True
            for s, e in pairs:
                if self.seq_from_signed_seg_num(s)[-o:] != \
                        self.seq_from_signed_seg_num(e)[:o]:
                    ok = False
                    break
            if ok:
                return o
        return 0

    def save_to_gfa(self, filename, verbosity=1, save_copy_depth_info=False,
                    save_seg_type_info=False, newline=False,
                    include_insert_size=False):
        log.log(('\n' if newline else '') + 'Saving ' + filename, verbosity)
        with open(filename, 'w') as gfa:
            for segment in sorted(self.segments.values(),
                                  key=lambda x: x.number):
                seg_line = segment.gfa_segment_line()
                colour, label = '', ''
                if save_copy_depth_info and segment.number in self.copy_depths:
                    colour = self.get_copy_number_colour(segment)
                    label = self.get_depth_string(segment)
                if save_seg_type_info and segment.bridge is not None:
                    colour = 'pink'
                    label = segment.get_seg_type_label()
                if colour or label:
                    seg_line = (seg_line[:-1] + '\tLB:z:'
                                + label.replace('\n', '\\n')
                                + '\tCL:z:' + colour + '\n')
                gfa.write(seg_line)
            gfa.write(self.get_all_gfa_link_lines())
            overlap_cigar = str(self.overlap) + 'M'
            for path_name, seg_list in sorted(self.paths.items()):
                gfa.write('P\t' + path_name + '\t'
                          + ','.join(int_to_signed_string(x)
                                     for x in seg_list)
                          + '\t' + ','.join([overlap_cigar]
                                            * (len(seg_list) - 1)) + '\n')
            if include_insert_size and self.insert_size_mean is not None \
                    and self.insert_size_deviation is not None:
                gfa.write('i\t' + str(self.insert_size_mean) + '\t'
                          + str(self.insert_size_deviation) + '\n')

    def get_all_gfa_link_lines(self):
        lines = []
        for start, ends in self.forward_links.items():
            for end in ends:
                if is_link_positive(start, end):
                    lines.append(self.gfa_link_line(start, end))
        return ''.join(lines)

    def gfa_link_line(self, start, end):
        return ('L\t' + str(abs(start)) + '\t' + get_sign_string(start)
                + '\t' + str(abs(end)) + '\t' + get_sign_string(end)
                + '\t' + str(self.overlap) + 'M\n')

    def save_to_fasta(self, filename, newline=False, min_length=1,
                      verbosity=1, silent=False):
        if not silent:
            log.log(('\n' if newline else '') + 'Saving ' + filename,
                    verbosity)
        circular = self.completed_circular_replicons()
        with open(filename, 'w') as fasta:
            for segment in sorted(self.segments.values(),
                                  key=lambda x: x.number):
                if segment.get_length() >= min_length:
                    fasta.write(
                        segment.get_fasta_name_and_description_line(circular))
                    fasta.write(
                        add_line_breaks_to_sequence(segment.forward_sequence))

    @staticmethod
    def save_specific_segments_to_fasta(filename, segments, silent=False):
        if not silent:
            log.log('Saving ' + filename)
        with open(filename, 'w') as fasta:
            for segment in sorted(segments, key=lambda x: x.number):
                fasta.write('>' + str(segment.number) + '\n')
                fasta.write(
                    add_line_breaks_to_sequence(segment.forward_sequence))

    # ------------------------------------------------------------------
    # Depth statistics (ref :119-216)
    # ------------------------------------------------------------------

    def get_median_read_depth(self, segment_list=None):
        """Median depth by base (ref :119-136)."""
        if not segment_list:
            segment_list = self.segments.values()
        by_depth = sorted(segment_list, key=lambda x: x.depth)
        total_length = sum(s.get_length_no_overlap(self.overlap)
                           for s in by_depth)
        halfway = total_length // 2
        so_far = 0
        for segment in by_depth:
            so_far += segment.get_length_no_overlap(self.overlap)
            if so_far >= halfway:
                return segment.depth
        return 0.0

    def _ten_longest(self):
        return sorted(self.segments.values(), reverse=True,
                      key=lambda x: x.get_length())[:10]

    def get_single_copy_depth(self):
        median_depth = self.get_median_read_depth(self._ten_longest())
        log.log('Median depth of 10 longest contigs: '
                + float_to_str(median_depth, 2), 2)
        log.log('', 2)
        return median_depth

    def reassign_read_depths(self):
        """Rebuild unoriginal depths from original-depth neighbours
        (ref :150-188)."""
        while True:
            for seg_num, segment in self.segments.items():
                if segment.original_depth:
                    continue
                down = self.get_exclusive_outputs(seg_num)
                depth_down = None
                if down:
                    segs = [self.segments[abs(x)] for x in down]
                    if all(s.original_depth for s in segs):
                        depth_down = sum(s.depth for s in segs)
                up = self.get_exclusive_inputs(seg_num)
                depth_up = None
                if up:
                    segs = [self.segments[abs(x)] for x in up]
                    if all(s.original_depth for s in segs):
                        depth_up = sum(s.depth for s in segs)
                if depth_down and depth_up:
                    new_depth = (depth_down + depth_up) / 2.0
                elif depth_down:
                    new_depth = depth_down
                elif depth_up:
                    new_depth = depth_up
                else:
                    new_depth = None
                if new_depth:
                    segment.depth = new_depth
                    segment.original_depth = True
                    break
            else:
                break

    def normalise_read_depths(self):
        median_depth = self.get_median_read_depth(self._ten_longest())
        if median_depth == 0.0:
            return
        for segment in self.segments.values():
            segment.depth /= median_depth

    def get_total_length(self):
        return sum(x.get_length() for x in self.segments.values())

    def get_total_length_no_overlaps(self):
        return sum(x.get_length_no_overlap(self.overlap)
                   for x in self.segments.values())

    # ------------------------------------------------------------------
    # Dead ends (ref :218-236, 807-851)
    # ------------------------------------------------------------------

    def total_dead_end_count(self):
        return sum(self.dead_end_count(n) for n in self.segments)

    def dead_end_count(self, seg_num):
        dead_ends = 0
        if not self.forward_links.get(seg_num):
            dead_ends += 1
        if not self.reverse_links.get(seg_num):
            dead_ends += 1
        return dead_ends

    def dead_end_change_if_deleted(self, seg_num):
        potential = 0
        for down in self.get_downstream_seg_nums(seg_num):
            if len(self.reverse_links[down]) == 1 and down != seg_num:
                potential += 1
        for up in self.get_upstream_seg_nums(seg_num):
            if len(self.forward_links[up]) == 1 and up != seg_num:
                potential += 1
        return potential - self.dead_end_count(seg_num)

    def dead_end_change_if_path_deleted(self, path_segments):
        start, end = path_segments[0], path_segments[-1]
        potential = 0
        downstream = self.get_downstream_seg_nums(end)
        for down in downstream:
            if len(self.reverse_links[down]) == 1 and down != end:
                potential += 1
        upstream = self.get_upstream_seg_nums(start)
        for up in upstream:
            if len(self.forward_links[up]) == 1 and up != start:
                potential += 1
        dead_ends = (0 if downstream else 1) + (0 if upstream else 1)
        return potential - dead_ends

    def starts_with_dead_end(self, signed_seg_num):
        return not self.reverse_links.get(signed_seg_num)

    def ends_with_dead_end(self, signed_seg_num):
        return not self.forward_links.get(signed_seg_num)

    # ------------------------------------------------------------------
    # Filters (ref :316-486)
    # ------------------------------------------------------------------

    def filter_by_read_depth(self, relative_depth_cutoff):
        """Remove low-depth segments per whole-graph and per-component
        cutoffs (ref :316-345)."""
        to_remove = []
        removed_length = 0
        whole_cutoff = (self.get_median_read_depth(self._ten_longest())
                        * relative_depth_cutoff)
        for component in self.get_connected_components():
            comp_segs = [self.segments[x] for x in component]
            comp_cutoff = (self.get_median_read_depth(comp_segs)
                           * relative_depth_cutoff)
            for seg_num in component:
                segment = self.segments[seg_num]
                if segment.depth < whole_cutoff or \
                        segment.depth < comp_cutoff:
                    if self.dead_end_count(seg_num) > 0 or \
                            self.all_segments_below_depth(component,
                                                          whole_cutoff) or \
                            self.dead_end_change_if_deleted(seg_num) <= 0:
                        to_remove.append(seg_num)
                        removed_length += segment.get_length()
        self.remove_segments(to_remove)
        return len(to_remove), removed_length

    def filter_homopolymer_loops(self):
        to_remove = []
        for component in self.get_connected_components():
            if all_segments_are_one_base([self.segments[x]
                                          for x in component]):
                to_remove += component
        self.remove_segments(to_remove)
        if to_remove:
            log.log('Removed homopolymer loops:', 3)
            log.log_number_list(to_remove, 3)

    def choose_largest_component(self):
        components = self.get_connected_components()
        lengths = [sum(self.segments[x].get_length() for x in comp)
                   for comp in components]
        if not lengths:
            return
        largest = max(lengths)
        to_remove = []
        for comp, length in zip(components, lengths):
            if length < largest:
                to_remove += comp
        self.remove_segments(to_remove)
        if to_remove:
            log.log('\nRemoved not-largest components:', 3)
            log.log_number_list(to_remove, 3)

    def remove_small_components(self, min_component_size):
        to_remove = []
        for comp in self.get_connected_components():
            segs = [self.segments[x] for x in comp]
            if sum(x.get_length() for x in segs) >= min_component_size:
                continue
            if any(x.bridge is not None for x in segs):
                continue
            to_remove += comp
        self.remove_segments(to_remove)
        if to_remove:
            log.log('\nRemoved small components:', 2)
            log.log_number_list(to_remove, 2)

    def remove_small_dead_ends(self, min_dead_end_size):
        removed = []
        while True:
            for seg_num, segment in self.segments.items():
                if segment.get_length() >= min_dead_end_size:
                    continue
                if self.dead_end_change_if_deleted(seg_num) < 0:
                    self.remove_segments([seg_num])
                    removed.append(seg_num)
                    break
            else:
                break
        if removed:
            log.log('\nRemoved small dead ends:', 2)
            log.log_number_list(removed, 2)

    # ------------------------------------------------------------------
    # Segment/link removal (ref :385-445, 602-659)
    # ------------------------------------------------------------------

    def remove_segments(self, nums_to_remove):
        """Delete segments, their links, and fix paths (ref :385-422)."""
        for num in nums_to_remove:
            assert num >= 0
            if num in self.segments:
                seg = self.segments[num]
                # Restore depth that this bridge segment took from others.
                if seg.bridge and seg.bridge.segments_reduced_depth:
                    for other_num, depth, copy_depth in \
                            seg.bridge.segments_reduced_depth:
                        if other_num in self.segments:
                            self.segments[other_num].depth += depth
                            if copy_depth and other_num in self.copy_depths:
                                self.copy_depths[other_num].append(copy_depth)
                del self.segments[num]
        for num in nums_to_remove:
            if num in self.copy_depths:
                del self.copy_depths[num]
        links_to_remove = set()
        for num in nums_to_remove:
            for down in self.get_downstream_seg_nums(num):
                links_to_remove.add((num, down))
            for up in self.get_upstream_seg_nums(num):
                links_to_remove.add((up, num))
        for start, end in links_to_remove:
            self.remove_link(start, end)
        self.remove_segments_from_paths(nums_to_remove)

    def remove_segments_from_paths(self, seg_nums):
        fixed = {}
        for name, path in self.paths.items():
            new_path = [x for x in path
                        if x not in seg_nums and -x not in seg_nums]
            if len(new_path) > 1 and self.is_path_valid(new_path):
                fixed[name] = new_path
        self.paths = fixed

    def is_path_valid(self, path):
        for i in range(1, len(path)):
            prev, cur = path[i - 1], path[i]
            if prev not in self.forward_links or \
                    cur not in self.forward_links[prev]:
                return False
        return True

    def add_link(self, start, end):
        """Add a link (and its implied RC / reverse entries, ref :602-625)."""
        for (d, a, b) in ((self.forward_links, start, end),
                          (self.forward_links, -end, -start)):
            d.setdefault(a, [])
            if b not in d[a]:
                d[a].append(b)
        for (d, a, b) in ((self.reverse_links, end, start),
                          (self.reverse_links, -start, -end)):
            d.setdefault(a, [])
            if b not in d[a]:
                d[a].append(b)

    def remove_link(self, start, end):
        for (d, a, b) in ((self.forward_links, start, end),
                          (self.forward_links, -end, -start),
                          (self.reverse_links, end, start),
                          (self.reverse_links, -start, -end)):
            if a in d:
                try:
                    d[a].remove(b)
                except ValueError:
                    pass
                if not d[a]:
                    del d[a]

    # ------------------------------------------------------------------
    # Topology queries (ref :661-805, 1863-1906, 2118-2136)
    # ------------------------------------------------------------------

    def seq_from_signed_seg_num(self, signed_num):
        if signed_num > 0:
            return self.segments[signed_num].forward_sequence
        return self.segments[-signed_num].reverse_sequence

    def get_downstream_seg_nums(self, seg_num):
        return self.forward_links.get(seg_num, [])

    def get_upstream_seg_nums(self, seg_num):
        return self.reverse_links.get(seg_num, [])

    def get_connected_components(self):
        """Sorted list of sorted unsigned-number components (ref :671-697)."""
        visited = set()
        components = []
        for v in self.segments:
            if v in visited:
                continue
            component = []
            q = deque([v])
            visited.add(v)
            while q:
                w = q.popleft()
                component.append(w)
                for k in self.get_connected_segments(w):
                    if k not in visited:
                        visited.add(k)
                        q.append(k)
            components.append(sorted(component))
        return sorted(components)

    def get_connected_segments(self, segment_num):
        connected = set()
        connected.update(abs(x)
                         for x in self.forward_links.get(segment_num, []))
        connected.update(abs(x)
                         for x in self.reverse_links.get(segment_num, []))
        return list(connected)

    def all_segments_below_depth(self, segment_nums, cutoff):
        return all(self.segments[n].depth < cutoff for n in segment_nums)

    def get_exclusive_inputs(self, segment_number):
        return [abs(x) for x in self.reverse_links.get(segment_number, [])
                if self.lead_exclusively_to(x, segment_number)]

    def get_exclusive_outputs(self, segment_number):
        return [abs(x) for x in self.forward_links.get(segment_number, [])
                if self.lead_exclusively_from(x, segment_number)]

    def get_exclusive_inputs_signed(self, segment_number):
        return [x for x in self.reverse_links.get(segment_number, [])
                if self.lead_exclusively_to(x, segment_number)]

    def get_exclusive_outputs_signed(self, segment_number):
        return [x for x in self.forward_links.get(segment_number, [])
                if self.lead_exclusively_from(x, segment_number)]

    def lead_exclusively_to(self, seg_num_1, seg_num_2):
        return self.forward_links.get(seg_num_1) == [seg_num_2]

    def lead_exclusively_from(self, seg_num_1, seg_num_2):
        return self.reverse_links.get(seg_num_1) == [seg_num_2]

    def search(self, start, ends):
        """Signed DFS from start towards any orientation of ends
        (ref :1863-1883)."""
        end_set = set(ends) | set(-x for x in ends)
        visited, stack = set(), [start]
        while stack:
            seg = stack.pop()
            if seg in visited:
                continue
            visited.add(seg)
            for nxt in self.forward_links.get(seg, []):
                if nxt in end_set:
                    return True
                if nxt not in visited:
                    stack.append(nxt)
        return False

    def sort_link_order(self):
        for seg_num in self.forward_links:
            self.forward_links[seg_num].sort()
        for seg_num in self.reverse_links:
            self.reverse_links[seg_num].sort()

    # ------------------------------------------------------------------
    # Merging (ref :488-600, 2189-2282)
    # ------------------------------------------------------------------

    def merge_all_possible(self, anchor_segments, bridging_mode):
        anchor_seg_nums = (set(x.number for x in anchor_segments)
                           if anchor_segments is not None else None)
        while True:
            for num in sorted(self.segments):
                path = self.get_simple_path(num, anchor_seg_nums,
                                            bridging_mode)
                assert len(path) > 0
                if len(path) > 1:
                    self.merge_simple_path(path)
                    break
            else:
                break
        self.renumber_segments()

    def merge_simple_path(self, merge_path):
        """Merge an unbranching path into one segment (ref :509-572)."""
        start, end = merge_path[0], merge_path[-1]
        mean_depth, original_depth = self.get_mean_path_depth(merge_path)
        for i in range(len(merge_path) - 1):
            if [merge_path[i + 1]] != self.forward_links[merge_path[i]]:
                raise BadPath(str(merge_path) + ' is not a simple path')

        new_num = self.get_next_available_seg_number()
        new_seg = Segment(new_num, mean_depth,
                          self.get_path_sequence(merge_path), True,
                          original_depth=original_depth)
        new_seg.build_other_sequence_if_necessary()

        paths_copy = self.paths.copy()
        outgoing = list(self.forward_links.get(end, []))
        incoming = list(self.reverse_links.get(start, []))
        outgoing = find_replace_one_val_in_list(outgoing, start, new_num)
        outgoing = find_replace_one_val_in_list(outgoing, -end, -new_num)
        incoming = find_replace_one_val_in_list(incoming, end, new_num)
        incoming = find_replace_one_val_in_list(incoming, -start, -new_num)

        self.remove_segments([abs(x) for x in merge_path])
        self.segments[new_num] = new_seg
        for link in outgoing:
            self.add_link(new_num, link)
        for link in incoming:
            self.add_link(link, new_num)

        flipped = [-x for x in reversed(merge_path)]
        for name in paths_copy:
            paths_copy[name] = find_replace_in_list(paths_copy[name],
                                                    merge_path, [new_num])
            paths_copy[name] = find_replace_in_list(paths_copy[name],
                                                    flipped, [-new_num])
        new_paths = {}
        for name, path_segments in paths_copy.items():
            pieces = split_path_multiple(path_segments, merge_path + flipped)
            if len(pieces) == 1:
                new_paths[name] = pieces[0]
            elif len(pieces) > 1:
                for i, piece in enumerate(pieces):
                    new_paths[name + '_' + str(i + 1)] = piece
        self.paths = new_paths
        return new_num

    def get_mean_path_depth(self, path):
        """Length-weighted mean depth over non-bridge path segments
        (ref :574-600)."""
        non_bridge = [abs(x) for x in path
                      if self.segments[abs(x)].bridge is None]
        original = [x for x in non_bridge if self.segments[x].original_depth]
        if original:
            nums, original_depth = original, True
        else:
            nums, original_depth = non_bridge, False
        depths = [self.segments[x].depth for x in nums]
        lengths = [self.segments[x].get_length() - self.overlap
                   for x in nums]
        new_depth = (weighted_average_list(depths, lengths)
                     if sum(lengths) > 0.0 else 1.0)
        return new_depth, original_depth

    def get_simple_path(self, starting_seg, single_copy_seg_nums,
                        bridging_mode):
        """Maximal unbranching path containing the starting segment
        (ref :1806-1851)."""
        simple_path = [starting_seg]
        while True:
            last = simple_path[-1]
            if len(self.forward_links.get(last, [])) != 1:
                break
            potential = self.forward_links[last][0]
            if potential in simple_path or -potential in simple_path:
                break
            if bridging_mode < 2 and not self.is_single_copy_or_bridge(
                    abs(potential), bridging_mode, single_copy_seg_nums):
                break
            if self.reverse_links[potential] == [last]:
                simple_path.append(potential)
            else:
                break
        while True:
            first = simple_path[0]
            if len(self.reverse_links.get(first, [])) != 1:
                break
            potential = self.reverse_links[first][0]
            if potential in simple_path or -potential in simple_path:
                break
            if bridging_mode < 2 and not self.is_single_copy_or_bridge(
                    abs(potential), bridging_mode, single_copy_seg_nums):
                break
            if self.forward_links[potential] == [first]:
                simple_path.insert(0, potential)
            else:
                break
        return simple_path

    def is_single_copy_or_bridge(self, seg_num, bridging_mode,
                                 single_copy_seg_nums):
        """Merge-eligibility by bridging mode (ref :2302-2329)."""
        if bridging_mode == 2 or single_copy_seg_nums is None:
            return True
        if self.segments[seg_num].bridge is not None:
            return True
        if seg_num in single_copy_seg_nums:
            return True
        if bridging_mode == 0:
            return False
        return seg_num in self.copy_depths and \
            len(self.copy_depths[seg_num]) == 1

    def merge_small_segments(self, max_merge_size):
        """Merge small junction spacers into their neighbours
        (ref :2189-2239)."""
        assert self.overlap == 0
        merged = []
        while True:
            for seg_num in sorted(self.segments):
                segment = self.segments[seg_num]
                if segment.get_length() > max_merge_size or \
                        segment.get_length() == 0:
                    continue
                down = self.get_downstream_seg_nums(seg_num)
                up = self.get_upstream_seg_nums(seg_num)
                if len(down) == 1 and len(up) > 1 and \
                        all(self.lead_exclusively_to(x, seg_num)
                            for x in up):
                    for up_num in up:
                        up_seg = self.segments[abs(up_num)]
                        if up_num > 0:
                            up_seg.append_to_forward_sequence(
                                segment.forward_sequence)
                        else:
                            up_seg.append_to_reverse_sequence(
                                segment.forward_sequence)
                    segment.remove_sequence()
                    merged.append(seg_num)
                    break
                if len(up) == 1 and len(down) > 1 and \
                        all(self.lead_exclusively_from(x, seg_num)
                            for x in down):
                    for down_num in down:
                        down_seg = self.segments[abs(down_num)]
                        if down_num > 0:
                            down_seg.prepend_to_forward_sequence(
                                segment.forward_sequence)
                        else:
                            down_seg.prepend_to_reverse_sequence(
                                segment.forward_sequence)
                    segment.remove_sequence()
                    merged.append(seg_num)
                    break
            else:
                break
            self.remove_zero_length_segs(suppress_log=True)
        if merged:
            log.log('\nMerged small segments:')
            log.log_number_list(merged)
            self.remove_zero_length_segs()
        return len(merged)

    def expand_repeats(self):
        """Pull common flanking sequence into repeat segments
        (ref :2241-2282)."""
        for seg_num in sorted(self.segments):

            def trim_amount_okay(seg_nums, trim_length):
                for num in seg_nums:
                    pos = abs(num)
                    count = [abs(x) for x in seg_nums].count(pos)
                    if count * trim_length > \
                            self.segments[pos].get_length():
                        return False
                return True

            segment = self.segments[seg_num]
            inputs = sorted(self.get_upstream_seg_nums(seg_num))
            if len(inputs) > 1 and inputs == sorted(
                    self.get_exclusive_inputs_signed(seg_num)):
                common_end = os.path.commonprefix(
                    [self.seq_from_signed_seg_num(x)[::-1]
                     for x in inputs])[::-1]
                n = len(common_end)
                if n > 0 and trim_amount_okay(inputs, n):
                    segment.prepend_to_forward_sequence(common_end)
                    for in_seg in inputs:
                        if in_seg > 0:
                            self.segments[in_seg].trim_from_end(n)
                        else:
                            self.segments[-in_seg].trim_from_start(n)

            outputs = sorted(self.get_downstream_seg_nums(seg_num))
            if len(outputs) > 1 and outputs == sorted(
                    self.get_exclusive_outputs_signed(seg_num)):
                common_start = os.path.commonprefix(
                    [self.seq_from_signed_seg_num(x) for x in outputs])
                n = len(common_start)
                if n > 0 and trim_amount_okay(outputs, n):
                    segment.append_to_forward_sequence(common_start)
                    for out_seg in outputs:
                        if out_seg > 0:
                            self.segments[out_seg].trim_from_start(n)
                        else:
                            self.segments[-out_seg].trim_from_end(n)

    # ------------------------------------------------------------------
    # Cleaning (ref :853-1024, 2138-2187)
    # ------------------------------------------------------------------

    def clean(self, read_depth_filter, largest_component):
        self.repair_multi_way_junctions()
        removed_count, removed_length = \
            self.filter_by_read_depth(read_depth_filter)
        self.filter_homopolymer_loops()
        if largest_component:
            self.choose_largest_component()
        self.merge_all_possible(None, 2)
        self.normalise_read_depths()
        self.remove_zero_length_segs(suppress_log=True)
        self.sort_link_order()
        return removed_count, removed_length

    def final_clean(self):
        assert self.overlap == 0
        self.remove_zero_length_segs()
        self.merge_small_segments(5)
        self.reassign_read_depths()
        self.normalise_read_depths()
        self.renumber_segments()
        self.sort_link_order()
        self.paths = {}

    def repair_multi_way_junctions(self):
        """Replace N-to-M junction link webs with a zero-length junction
        segment (ref :891-1005)."""
        seg_nums = list(self.segments) + [-x for x in self.segments]
        already_examined = set()
        for seg_num in seg_nums:
            if seg_num in already_examined:
                continue
            upstream_segs = {seg_num}
            downstream_segs = set()
            while True:
                up_size = len(upstream_segs)
                down_size = len(downstream_segs)
                for up in upstream_segs:
                    downstream_segs.update(self.get_downstream_seg_nums(up))
                for down in downstream_segs:
                    upstream_segs.update(self.get_upstream_seg_nums(down))
                if len(upstream_segs) == up_size and \
                        len(downstream_segs) == down_size:
                    break
            if len(upstream_segs) < 2 or len(downstream_segs) < 2:
                continue
            already_examined.update(upstream_segs)
            already_examined.update(-s for s in downstream_segs)
            if len(upstream_segs) > 8:
                continue

            starting_groups, ending_groups = [], []
            used_subsets = []
            for i in range(len(upstream_segs), 1, -1):
                for subset in set(itertools.combinations(upstream_segs, i)):
                    if any(set(subset).issubset(x) for x in used_subsets):
                        continue
                    down_subset = set()
                    for up in subset:
                        down_subset.update(self.get_downstream_seg_nums(up))
                    down_subset = [x for x in down_subset
                                   if all(y in self.get_upstream_seg_nums(x)
                                          for y in subset)]
                    if len(down_subset) < 2:
                        continue
                    used_subsets.append(set(subset))
                    starting_segs = sorted(subset)
                    ending_segs = sorted(down_subset)
                    for s in starting_segs:
                        for e in ending_segs:
                            assert e in self.forward_links[s]
                            assert s in self.reverse_links[e]
                    starting_groups.append(starting_segs)
                    ending_groups.append(ending_segs)

            for starting_segs, ending_segs in zip(starting_groups,
                                                  ending_groups):
                bridge_num = self.get_next_available_seg_number()
                depth = (sum(self.segments[abs(x)].depth
                             for x in starting_segs)
                         + sum(self.segments[abs(x)].depth
                               for x in ending_segs)) / 2.0
                bridge_seq = \
                    self.seq_from_signed_seg_num(ending_segs[0])[:self.overlap]
                bridge_seg = Segment(bridge_num, depth, bridge_seq, True)
                bridge_seg.build_other_sequence_if_necessary()
                self.segments[bridge_num] = bridge_seg
                for s in starting_segs:
                    for e in ending_segs:
                        self.remove_link(s, e)
                for s in starting_segs:
                    self.add_link(s, bridge_num)
                for e in ending_segs:
                    self.add_link(bridge_num, e)
                for name in self.paths:
                    for s in starting_segs:
                        for e in ending_segs:
                            self.paths[name] = insert_num_in_list(
                                self.paths[name], s, e, bridge_num)
                            self.paths[name] = insert_num_in_list(
                                self.paths[name], -e, -s, -bridge_num)

    def remove_unnecessary_links(self):
        """Remove direct links that duplicate a 0 bp segment's connection
        (ref :1007-1024)."""
        assert self.overlap == 0
        for seg_num in list(self.segments) + [-x for x in self.segments]:
            down_segs = self.get_downstream_seg_nums(seg_num)
            zero_bp = [x for x in down_segs
                       if self.segments[abs(x)].get_length() == 0]
            for zseg in zero_bp:
                down_2 = self.get_downstream_seg_nums(zseg)
                for common in set(down_segs) & set(down_2):
                    self.remove_link(seg_num, common)

    def remove_zero_length_segs(self, suppress_log=False):
        """Remove non-junction overlap-length segments, reconnecting their
        neighbours (ref :2138-2187)."""
        segs_to_remove = []
        for seg_num in sorted(self.segments):
            seg = self.segments[seg_num]
            if seg.get_length() != self.overlap:
                continue
            fwd = len(self.forward_links.get(seg_num, []))
            rev = len(self.reverse_links.get(seg_num, []))
            if fwd > 1 and rev > 1:
                continue
            if fwd == 0 and rev > 1:
                continue
            if fwd > 1 and rev == 0:
                continue
            segs_to_remove.append(seg_num)
            if fwd == 1 and rev > 0:
                down = self.forward_links[seg_num][0]
                for up in self.reverse_links[seg_num]:
                    self.add_link(up, down)
            elif rev == 1 and fwd > 0:
                up = self.reverse_links[seg_num][0]
                for down in self.forward_links[seg_num]:
                    self.add_link(up, down)
        if segs_to_remove:
            self.remove_segments(segs_to_remove)
            verbosity = 2 if suppress_log else 1
            log.log(('  ' if suppress_log else '\n')
                    + 'Removed zero-length segments:', verbosity)
            log.log_number_list(segs_to_remove, verbosity)
        return len(segs_to_remove)

    # ------------------------------------------------------------------
    # Copy depth bookkeeping (ref :1026-1087)
    # ------------------------------------------------------------------

    def get_next_available_seg_number(self):
        return max(self.segments) + 1

    def get_depth_string(self, segment):
        if segment.number not in self.copy_depths:
            return ''
        return '\n'.join('%.3f' % x
                         for x in self.copy_depths[segment.number])

    def get_copy_number(self, segment):
        if segment.number not in self.copy_depths:
            return 0
        return len(self.copy_depths[segment.number])

    def get_copy_number_colour(self, segment):
        return {0: 'grey', 1: 'forestgreen', 2: 'gold',
                3: 'darkorange'}.get(self.get_copy_number(segment), 'red')

    def is_seg_num_single_copy(self, seg_num):
        return seg_num in self.copy_depths and \
            len(self.copy_depths[seg_num]) == 1

    def get_single_copy_segments(self):
        return [seg for num, seg in self.segments.items()
                if self.is_seg_num_single_copy(num)]

    def get_no_copy_depth_segments(self):
        return [seg for num, seg in self.segments.items()
                if not self.copy_depths.get(num)]

    # ------------------------------------------------------------------
    # Paths (ref :1089-1113, 1606-1644, 1885-1906)
    # ------------------------------------------------------------------

    def get_path_sequence(self, path_segments):
        path_sequence = ''
        prev = None
        for i, seg_num in enumerate(path_segments):
            seq = self.seq_from_signed_seg_num(seg_num)
            if i == 0:
                path_sequence = seq
            else:
                if seg_num not in self.forward_links[prev]:
                    raise BadPath(str(path_segments) + ' is not a valid path')
                if self.overlap > 0 and \
                        path_sequence[-self.overlap:] != seq[:self.overlap]:
                    raise BadOverlaps(
                        'overlaps do not match when merging ' + str(prev)
                        + ' and ' + str(seg_num) + ' in path '
                        + str(path_segments))
                path_sequence += seq[self.overlap:]
            prev = seg_num
        return path_sequence

    def max_path_segment_count(self, seg_num, start_end_depth):
        if abs(seg_num) in self.copy_depths:
            count_by_copies = len(self.copy_depths[abs(seg_num)])
        else:
            count_by_copies = 1
        depth = self.segments[abs(seg_num)].depth
        count_by_depth = max(1, int(round(depth / start_end_depth)))
        return 2 * max(count_by_copies, count_by_depth)

    def get_path_length(self, path):
        if not path:
            return 0
        try:
            total = sum(self.segments[abs(s)].get_length() for s in path)
            return total - (len(path) - 1) * self.overlap
        except KeyError:
            return 0

    def get_bridge_path_length(self, path):
        return self.overlap if not path else self.get_path_length(path)

    def get_path_availability(self, path):
        """Fraction of a path's bases still depth-available (ref :1885-1906)."""
        total_bases = 0
        available_bases = 0.0
        for seg_num in path:
            seg = self.segments[abs(seg_num)]
            availability = 1.0 if seg.depth >= 0.5 else 2 * seg.depth
            seg_len = seg.get_length() - self.overlap
            total_bases += seg_len
            available_bases += seg_len * availability
        if total_bases == 0:
            return 1.0
        return max(0.0, available_bases / total_bases)

    def get_estimated_sequence_len(self):
        single_copy_depth = self.get_single_copy_depth()
        total = 0.0
        for seg_num, seg in self.segments.items():
            seg_len = seg.get_length()
            if seg_num in self.forward_links:
                seg_len -= self.overlap / 2
            if seg_num in self.reverse_links:
                seg_len -= self.overlap / 2
            total += seg_len * (seg.depth / single_copy_depth)
        return total

    # ------------------------------------------------------------------
    # Bridging (ref :1115-1533)
    # ------------------------------------------------------------------

    def apply_bridges(self, bridges, verbosity, min_bridge_qual):
        """Apply bridges best-first with conflict rules (ref :1115-1210)."""
        log.log_section_header('Applying bridges')
        unbridged_graph = copy.deepcopy(self)
        right_bridged = set()
        left_bridged = set()
        seg_nums_used_in_bridges = []
        applied_bridges = []
        sorted_bridges = sorted(bridges, reverse=True,
                                key=lambda x: (x.get_type_score(), x.quality))
        # Verbosity 1 lists applied bridges; higher verbosity lists EVERY
        # candidate with a Result column (applied/rejected/unused), the
        # reference's table contract (ref assembly_graph.py:1139-1210) —
        # the reference-equivalence harness diffs these rows.
        table = [['Bridge type', 'Start -> end', 'Path', 'Quality']]
        if verbosity > 1:
            table[0].append('Result')
        for bridge in sorted_bridges:
            can_use = self.start_end_available_to_bridge(
                bridge.start_segment, bridge.end_segment, right_bridged,
                left_bridged)
            if can_use:
                if hasattr(bridge, 'all_paths') and len(bridge.all_paths) > 1:
                    bridge.set_path_based_on_availability(
                        self, unbridged_graph)
                # Conflict rule: don't apply a bridge whose start/end lives
                # inside an applied bridge's path when that applied bridge's
                # own start/end lives inside this bridge's path
                # (ref :1159-1183).
                users = []
                for endpoint in (bridge.start_segment, bridge.end_segment):
                    if abs(endpoint) in seg_nums_used_in_bridges:
                        for applied in applied_bridges:
                            path_segs = set(abs(x)
                                            for x in applied.graph_path)
                            if abs(endpoint) in path_segs:
                                users.append(applied)
                if users:
                    segs_in_path = set(abs(x) for x in bridge.graph_path)
                    for user in users:
                        if abs(user.start_segment) in segs_in_path or \
                                abs(user.end_segment) in segs_in_path:
                            can_use = False
            row = [bridge.get_type_name(),
                   str(bridge.start_segment) + ' -> '
                   + str(bridge.end_segment),
                   ', '.join(str(x) for x in bridge.graph_path),
                   '%.3f' % bridge.quality]
            if can_use:
                if bridge.quality >= min_bridge_qual:
                    self.apply_bridge(bridge, right_bridged, left_bridged,
                                      seg_nums_used_in_bridges)
                    seg_nums_used_in_bridges = remove_dupes_preserve_order(
                        seg_nums_used_in_bridges)
                    applied_bridges.append(bridge)
                    if verbosity > 1:
                        row.append('applied')
                    table.append(row)
                elif verbosity > 1:
                    table.append(row + ['rejected'])
            elif verbosity > 1:
                table.append(row + ['unused'])
        if verbosity > 0:
            print_table(table, alignments='LLLRR', indent=0,
                        max_col_width=40, wrap_cells=True,
                        out=lambda s: log.log(s, 1))
        return set(seg_nums_used_in_bridges)

    def apply_bridge(self, bridge, right_bridged, left_bridged,
                     seg_nums_used_in_bridges):
        start, end = bridge.start_segment, bridge.end_segment
        for link in list(self.forward_links.get(start, [])):
            self.remove_link(start, link)
        for link in list(self.reverse_links.get(end, [])):
            self.remove_link(link, end)

        # Miniasm bridges can require trimming the bridged segments
        # (ref :1226-1238).
        if getattr(bridge, 'start_overlap', 0) or \
                getattr(bridge, 'end_overlap', 0):
            start_seg = self.segments[abs(start)]
            if start > 0:
                start_seg.trim_from_end(bridge.start_overlap)
            else:
                start_seg.trim_from_start(bridge.start_overlap)
            end_seg = self.segments[abs(end)]
            if end > 0:
                end_seg.trim_from_start(bridge.end_overlap)
            else:
                end_seg.trim_from_end(bridge.end_overlap)

        new_num = self.get_next_available_seg_number()
        new_seg = Segment(new_num, bridge.depth, bridge.bridge_sequence,
                          True, bridge, bridge.graph_path)
        new_seg.build_other_sequence_if_necessary()
        self.segments[new_num] = new_seg
        self.add_link(start, new_num)
        self.add_link(new_num, end)
        for seg_num in list(set(bridge.graph_path)):
            self.add_bridge_to_segment(self.segments[abs(seg_num)], bridge)
        add_to_bridged_sets(start, end, right_bridged, left_bridged)
        seg_nums_used_in_bridges.extend(abs(x) for x in bridge.graph_path)

    def add_bridge_to_segment(self, segment, bridge):
        """Track bridge usage; subtract depth only for non-redundant bridges
        (ref :1258-1289)."""
        full_path = [bridge.start_segment] + bridge.graph_path + \
            [bridge.end_segment]
        bridge_str = '_' + '_'.join(str(x) for x in full_path) + '_'
        if not segment.used_in_bridges:
            segment.used_in_bridges.append(bridge_str)
            self.subtract_depth_from_segment(segment, bridge)
            return
        reverse_str = '_' + '_'.join(str(-x)
                                     for x in full_path[::-1]) + '_'
        new_used = []
        redundancy_found = False
        for used in segment.used_in_bridges:
            if bridge_str in used or reverse_str in used:
                new_used.append(used)
                redundancy_found = True
            elif used in bridge_str or used in reverse_str:
                new_used.append(bridge_str)
                redundancy_found = True
            else:
                new_used.append(used)
        segment.used_in_bridges = new_used
        if not redundancy_found:
            segment.used_in_bridges.append(bridge_str)
            self.subtract_depth_from_segment(segment, bridge)

    def subtract_depth_from_segment(self, seg, bridge):
        seg_num = seg.number
        removed_depth = bridge.depth
        seg.depth -= removed_depth
        seg.original_depth = False
        if self.copy_depths.get(seg_num):
            removed_copy_depth = min(self.copy_depths[seg_num],
                                     key=lambda x: abs(x - removed_depth))
            self.copy_depths[seg_num].remove(removed_copy_depth)
        else:
            removed_copy_depth = None
        bridge.segments_reduced_depth.append(
            (seg_num, removed_depth, removed_copy_depth))

    @staticmethod
    def start_end_available_to_bridge(start, end, right_bridged,
                                      left_bridged):
        if start > 0 and start in right_bridged:
            return False
        if start < 0 and -start in left_bridged:
            return False
        if end > 0 and end in left_bridged:
            return False
        if end < 0 and -end in right_bridged:
            return False
        return True

    def clean_up_after_bridging_1(self, anchor_segments,
                                  seg_nums_used_in_bridges):
        log.log_section_header('Cleaning up leftover segments', 2)
        for seg_num, seg in self.segments.items():
            if seg.bridge is not None:
                seg_nums_used_in_bridges.add(seg_num)
        anchor_seg_nums = set(x.number for x in anchor_segments)
        self.remove_unbridging_segments(anchor_seg_nums)
        self.remove_components_without_anchor_segments(anchor_seg_nums)
        self.remove_components_entirely_used_in_bridges(
            seg_nums_used_in_bridges)

    def clean_up_after_bridging_2(self, seg_nums_used_in_bridges,
                                  min_component_size, min_dead_end_size,
                                  unbridged_graph, anchor_segments):
        """Usedupness-driven deletion of leftover segments (ref :1344-1462)."""
        removed_segments = []
        usedupness_scores = defaultdict(float)
        for seg_num in seg_nums_used_in_bridges:
            if seg_num in self.segments and \
                    seg_num in unbridged_graph.segments:
                usedupness_scores[seg_num] = self.get_usedupness_score(
                    seg_num, unbridged_graph)

        while True:
            while True:
                for seg_num in seg_nums_used_in_bridges:
                    if seg_num in self.segments and \
                            self.dead_end_count(seg_num) > 0:
                        self.remove_segments([seg_num])
                        removed_segments.append(seg_num)
                        break
                else:
                    break
            path_groups = []
            segs_in_groups = set()
            for seg_num in seg_nums_used_in_bridges:
                if seg_num in self.segments and \
                        seg_num not in segs_in_groups:
                    path = self.get_simple_path(seg_num, None, 2)
                    if all(abs(x) in seg_nums_used_in_bridges
                           for x in path):
                        path_groups.append(path)
                        segs_in_groups.update(path)
            scored = []
            for group in path_groups:
                min_score = min((usedupness_scores[abs(x)] for x in group),
                                default=100.0)
                scored.append((min_score, group))
            scored.sort(reverse=True, key=lambda x: x[0])
            for _, path in scored:
                if self.dead_end_change_if_path_deleted(path) <= 0:
                    unsigned = [abs(x) for x in path]
                    self.remove_segments(unsigned)
                    removed_segments += unsigned
                    break
            else:
                break

        while True:
            candidates = []
            for seg_num in self.segments:
                path = self.get_simple_path(seg_num, None, 2)
                lengths = [max(1, self.segments[abs(x)].get_length()
                               - self.overlap) for x in path]
                usedupness = [usedupness_scores[abs(x)] for x in path]
                candidates.append(
                    (weighted_average_list(usedupness, lengths), path))
            for usedupness, path in candidates:
                if usedupness > settings.CLEANING_USEDUPNESS_THRESHOLD and \
                        self.dead_end_change_if_path_deleted(path) <= 0:
                    unsigned = [abs(x) for x in path]
                    self.remove_segments(unsigned)
                    removed_segments += unsigned
                    break
            else:
                break

        for component in self.get_connected_components():
            lengths = [self.segments[abs(x)].get_length()
                       for x in component]
            usedupness = [usedupness_scores[abs(x)] for x in component]
            if weighted_average_list(usedupness, lengths) > \
                    settings.CLEANING_USEDUPNESS_THRESHOLD:
                self.remove_segments(component)
                removed_segments += component

        if removed_segments:
            log.log('Removed segments used in bridges:', 2)
            log.log_number_list(sorted(set(removed_segments)), 2)
        for segment in self.segments.values():
            segment.depth = max(0.0, segment.depth)
        anchor_seg_nums = set(x.number for x in anchor_segments)
        self.remove_components_without_anchor_segments(anchor_seg_nums)
        self.remove_components_entirely_used_in_bridges(
            seg_nums_used_in_bridges)
        self.remove_unbridging_segments(anchor_seg_nums)
        self.remove_small_components(min_component_size)
        self.remove_small_dead_ends(min_dead_end_size)

    def remove_components_without_anchor_segments(self, anchor_seg_nums):
        to_remove = []
        for component in self.get_connected_components():
            if not any(abs(x) in anchor_seg_nums for x in component):
                to_remove += component
        if to_remove:
            log.log('Removed components with no single copy segments:', 2)
            log.log_number_list(sorted(to_remove), 2)
        self.remove_segments(to_remove)

    def remove_components_entirely_used_in_bridges(self,
                                                   seg_nums_used_in_bridges):
        to_remove = []
        for component in self.get_connected_components():
            if all(abs(x) in seg_nums_used_in_bridges for x in component):
                to_remove += component
        if to_remove:
            log.log('Removed components used in bridges:', 2)
            log.log_number_list(sorted(to_remove), 2)
        self.remove_segments(to_remove)

    def remove_unbridging_segments(self, anchor_seg_nums):
        to_remove = []
        for seg_num in self.segments:
            if seg_num in anchor_seg_nums:
                continue
            if not (self.search(seg_num, anchor_seg_nums)
                    and self.search(-seg_num, anchor_seg_nums)):
                to_remove.append(seg_num)
        if to_remove:
            log.log('Removed unbridging segments:', 2)
            log.log_number_list(to_remove, 2)
        self.remove_segments(to_remove)

    def get_usedupness_score(self, seg_num, unbridged_graph):
        original_depth = unbridged_graph.segments[seg_num].depth
        current_depth = self.segments[seg_num].depth
        depth_fraction_used = (original_depth - current_depth) / \
            original_depth
        penalty = score_function(original_depth, 4.0)
        return depth_fraction_used - (penalty / 2.0)

    # ------------------------------------------------------------------
    # Loops and junctions (ref :1535-1604, 2331-2359)
    # ------------------------------------------------------------------

    def find_all_simple_loops(self):
        """All A->B->C->B->D structures as (start, end, middle, repeat)
        (ref :1535-1604)."""
        simple_loops = []
        for middle in self.segments:
            if self.segments[middle].get_length() > \
                    settings.MAX_SIMPLE_LOOP_SIZE:
                continue
            if middle not in self.forward_links or \
                    middle not in self.reverse_links:
                continue
            if len(self.forward_links[middle]) != 1 or \
                    len(self.reverse_links[middle]) != 1:
                continue
            if self.forward_links[middle][0] != \
                    self.reverse_links[middle][0]:
                continue
            repeat = self.forward_links[middle][0]
            if len(self.forward_links[repeat]) != 2 or \
                    len(self.reverse_links[repeat]) != 2:
                continue
            start = self.reverse_links[repeat][0]
            if abs(start) == abs(middle):
                start = self.reverse_links[repeat][1]
            if abs(start) == abs(middle) or abs(start) == abs(repeat):
                continue
            end = self.forward_links[repeat][0]
            if abs(end) == abs(middle):
                end = self.forward_links[repeat][1]
            if abs(end) == abs(middle) or abs(end) == abs(repeat):
                continue
            simple_loops.append((start, end, middle, repeat))

        for repeat in self.segments:
            if len(self.forward_links.get(repeat, [])) != 2 or \
                    len(self.reverse_links.get(repeat, [])) != 2:
                continue
            if repeat not in self.forward_links[repeat] or \
                    repeat not in self.reverse_links[repeat]:
                continue
            start_segs = [x for x in self.reverse_links[repeat]
                          if x != repeat]
            end_segs = [x for x in self.forward_links[repeat]
                        if x != repeat]
            if len(start_segs) != 1 or len(end_segs) != 1:
                continue
            start, end = start_segs[0], end_segs[0]
            if abs(start) == abs(repeat) or abs(end) == abs(repeat):
                continue
            simple_loops.append((start, end, None, repeat))
        return simple_loops

    def find_simple_two_way_junctions(self, valid_segments):
        """2-in 2-out double-copy junction segments (ref :2331-2359)."""
        valid_seg_nums = set(x.number for x in valid_segments)
        junctions = []
        for segment in self.segments.values():
            if self.get_copy_number(segment) != 2:
                continue
            seg_num = segment.number
            if len(self.reverse_links.get(seg_num, [])) != 2 or \
                    len(self.forward_links.get(seg_num, [])) != 2:
                continue
            if len(self.get_exclusive_inputs(seg_num)) != 2 or \
                    len(self.get_exclusive_outputs(seg_num)) != 2:
                continue
            if any(x not in valid_seg_nums
                   for x in self.get_connected_segments(seg_num)):
                continue
            junctions.append(seg_num)
        return junctions

    # ------------------------------------------------------------------
    # Renumbering + stats (ref :1646-1804)
    # ------------------------------------------------------------------

    def renumber_segments(self):
        old_nums = [x.number for x in
                    sorted(self.segments.values(), reverse=True,
                           key=lambda x: x.get_length())]
        new_nums = list(range(1, len(old_nums) + 1))
        changes = dict(zip(old_nums + [-x for x in old_nums],
                           new_nums + [-x for x in new_nums]))
        new_segments = {}
        for seg_num, seg in self.segments.items():
            seg.number = changes[seg_num]
            new_segments[seg.number] = seg
        self.segments = new_segments
        self.forward_links = {changes[k]: [changes[x] for x in v]
                              for k, v in self.forward_links.items() if v}
        self.reverse_links = {changes[k]: [changes[x] for x in v]
                              for k, v in self.reverse_links.items() if v}
        self.copy_depths = {changes[k]: v
                            for k, v in self.copy_depths.items()}
        self.paths = {name: [changes[x] for x in path]
                      for name, path in self.paths.items()}

    def get_total_link_count(self):
        links = set()
        for start, ends in self.forward_links.items():
            for end in ends:
                if (start, end) not in links and \
                        (-end, -start) not in links:
                    links.add((start, end))
        return len(links)

    def get_component_link_count(self, component_segs):
        links = set()
        component_segs = set(component_segs)
        for start, ends in self.forward_links.items():
            for end in ends:
                if abs(start) in component_segs and \
                        abs(end) in component_segs and \
                        (start, end) not in links and \
                        (-end, -start) not in links:
                    links.add((start, end))
        return len(links)

    def get_contig_stats(self, seg_nums=None):
        """(n50, shortest, Q1, median, Q3, longest) (ref :1740-1776)."""
        segs = (self.segments.values() if seg_nums is None
                else [self.segments[x] for x in seg_nums])
        lengths = sorted(x.get_length() for x in segs)
        if not lengths:
            return 0, 0, 0, 0, 0, 0
        shortest, longest = lengths[0], lengths[-1]
        q1 = int(round(value_from_fractional_index(
            lengths, (len(lengths) - 1) / 4)))
        median = int(round(value_from_fractional_index(
            lengths, (len(lengths) - 1) / 2)))
        q3 = int(round(value_from_fractional_index(
            lengths, (len(lengths) - 1) * 3 / 4)))
        half_total = sum(lengths) / 2
        so_far = 0
        n50 = 0
        for length in lengths[::-1]:
            so_far += length
            if so_far >= half_total:
                n50 = length
                break
        return n50, shortest, q1, median, q3, longest

    def get_n_segment_length(self, n_percent):
        total = self.get_total_length()
        target = total * (n_percent / 100.0)
        so_far = 0
        for segment in sorted(self.segments.values(), reverse=True,
                              key=lambda x: x.get_length()):
            so_far += segment.get_length()
            if so_far >= target:
                return segment.get_length()
        return 0

    def print_component_table(self):
        table = [['Component', 'Segments', 'Links', 'Length', 'N50',
                  'Longest segment', 'Status']]
        components = self.get_connected_components()
        if len(components) > 1:
            n50, _, _, _, _, longest = self.get_contig_stats()
            table.append(['total', int_to_str(len(self.segments)),
                          int_to_str(self.get_total_link_count()),
                          int_to_str(self.get_total_length()),
                          int_to_str(n50), int_to_str(longest), ''])
        for i, component in enumerate(components):
            status = ('complete' if self.is_component_complete(component)
                      else 'incomplete')
            n50, _, _, _, _, longest = self.get_contig_stats(component)
            table.append([
                str(i + 1), int_to_str(len(component)),
                int_to_str(self.get_component_link_count(component)),
                int_to_str(sum(self.segments[x].get_length()
                               for x in component)),
                int_to_str(n50), int_to_str(longest), status])
        print_table(table, alignments='RRRRRRR', indent=0,
                    out=lambda s: log.log(s, 1))

    def completed_circular_replicons(self):
        completed = []
        for component in self.get_connected_components():
            if len(component) != 1:
                continue
            seg = component[0]
            if self.forward_links.get(seg) == [seg] and \
                    self.reverse_links.get(seg) == [seg]:
                completed.append(seg)
        return completed

    def is_component_complete(self, component):
        if len(component) != 1:
            return False
        seg = component[0]
        return self.get_downstream_seg_nums(seg) == [seg] and \
            self.get_upstream_seg_nums(seg) == [seg]

    def rotate_circular_sequences(self, shift_fraction=0.70710678118655):
        for replicon in self.completed_circular_replicons():
            segment = self.segments[replicon]
            segment.rotate_sequence(
                int(segment.get_length() * shift_fraction), False)

    # ------------------------------------------------------------------
    # Overlap removal (ref :1926-2116)
    # ------------------------------------------------------------------

    def remove_all_overlaps(self):
        """Remove the constant graph overlap by 2-colouring edges into
        trim-from-start vs trim-from-end groups with must-match /
        must-differ constraint propagation (ref :1926-2116)."""
        if self.overlap == 0:
            log.log('Graph has no overlaps - overlap removal not needed')
            return

        all_edges = set()
        for start, ends in self.forward_links.items():
            for end in ends:
                all_edges.add((start, end))
                all_edges.add((-end, -start))

        large_half = int(math.ceil(self.overlap / 2))
        small_half = int(math.floor(self.overlap / 2))

        must_match = defaultdict(set)
        must_differ = defaultdict(set)

        # An edge and its reverse complement must be in opposite groups.
        for edge in all_edges:
            rev_edge = (-edge[1], -edge[0])
            must_differ[edge].add(rev_edge)
            must_differ[rev_edge].add(edge)

        # Edges sharing a segment side must be in the same group.
        pos_and_neg = list(self.segments) + [-x for x in self.segments]
        for seg in pos_and_neg:
            downstream = self.get_downstream_seg_nums(seg)
            if len(downstream) > 1:
                e1_for = (seg, downstream[0])
                e1_rev = (-downstream[0], -seg)
                for down in downstream[1:]:
                    e2_for = (seg, down)
                    e2_rev = (-down, -seg)
                    must_match[e1_for].add(e2_for)
                    must_match[e2_for].add(e1_for)
                    must_match[e1_rev].add(e2_rev)
                    must_match[e2_rev].add(e1_rev)
            upstream = self.get_upstream_seg_nums(seg)
            if len(upstream) > 1:
                e1_for = (upstream[0], seg)
                e1_rev = (-seg, -upstream[0])
                for up in upstream[1:]:
                    e2_for = (up, seg)
                    e2_rev = (-seg, -up)
                    must_match[e1_for].add(e2_for)
                    must_match[e2_for].add(e1_for)
                    must_match[e1_rev].add(e2_rev)
                    must_match[e2_rev].add(e1_rev)

        # Overlap-sized segments can't take the large trim on both sides.
        small_segs = [x for x in pos_and_neg
                      if self.segments[abs(x)].get_length() == self.overlap]
        for seg in small_segs:
            downstream = self.get_downstream_seg_nums(seg)
            upstream = self.get_upstream_seg_nums(seg)
            if downstream and upstream:
                for down in downstream:
                    e1_for = (seg, down)
                    e1_rev = (-down, -seg)
                    for up in upstream:
                        e2_for = (up, seg)
                        e2_rev = (-seg, -seg)
                        must_match[e1_for].add(e2_for)
                        must_match[e2_for].add(e1_for)
                        must_match[e1_rev].add(e2_rev)
                        must_match[e2_rev].add(e1_rev)

        group_1, group_2 = set(), set()
        for edge in list(all_edges):
            if edge in group_1 or edge in group_2:
                continue
            new_1, new_2 = {edge}, set()
            while True:
                size_1, size_2 = len(new_1), len(new_2)
                add_1, add_2 = set(), set()
                for e in new_1:
                    add_1.update(must_match[e])
                    add_2.update(must_differ[e])
                for e in new_2:
                    add_2.update(must_match[e])
                    add_1.update(must_differ[e])
                new_1.update(add_1)
                new_2.update(add_2)
                if len(new_1) == size_1 and len(new_2) == size_2:
                    break
            group_1.update(new_1)
            group_2.update(new_2)

        for e in group_1:
            if must_match[e] & group_2 or must_differ[e] & group_1:
                raise CannotTrimOverlaps
        for e in group_2:
            if must_match[e] & group_1 or must_differ[e] & group_2:
                raise CannotTrimOverlaps

        large_trim_end = set()
        large_trim_start = set()
        for start_seg, _ in group_1:
            if start_seg > 0:
                large_trim_end.add(start_seg)
            else:
                large_trim_start.add(-start_seg)
        for _, end_seg in group_2:
            if end_seg > 0:
                large_trim_start.add(end_seg)
            else:
                large_trim_end.add(-end_seg)

        for seg_num, segment in self.segments.items():
            start_trim = (large_half if seg_num in large_trim_start
                          else small_half)
            end_trim = (large_half if seg_num in large_trim_end
                        else small_half)
            segment.trim_from_start(start_trim)
            segment.trim_from_end(end_trim)
        log.log('Graph overlaps removed')
        self.overlap = 0
