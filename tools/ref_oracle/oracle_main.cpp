// Oracle driver for golden-fixture reconciliation.
//
// Builds against the (read-only) reference library at /root/reference and
// dumps stage-level golden data for the canonical demo fixture
// (reference detect_3d_cuboid/src/main.cpp:29-76):
//   - aligned / inside-ROI / merged line segments
//   - Canny edge map and OpenCV 3x3-chamfer distance map of the expanded ROI
//   - the ranked proposal set (pos/scale/rotY/config/errors/2D corners)
//
// All outputs go to the directory given as argv[1]. This tool is test
// infrastructure only — nothing from here ships in the framework package.
#include <cstdio>
#include <fstream>
#include <iostream>
#include <string>
#include <vector>

#include <Eigen/Core>
#include <Eigen/Dense>
#include <opencv2/opencv.hpp>

#include "detect_3d_cuboid/detect_3d_cuboid.h"
#include "detect_3d_cuboid/matrix_utils.h"
#include "detect_3d_cuboid/object_3d_util.h"

using Eigen::Matrix3d;
using Eigen::Matrix4d;
using Eigen::MatrixXd;
using Eigen::Vector2d;

static void dump_matrix(const std::string& path, const MatrixXd& m) {
  std::ofstream f(path);
  f.precision(10);
  for (int r = 0; r < m.rows(); r++) {
    for (int c = 0; c < m.cols(); c++) f << m(r, c) << (c + 1 < m.cols() ? " " : "");
    f << "\n";
  }
}

static void dump_cvmat_float(const std::string& path, const cv::Mat& m) {
  std::ofstream f(path);
  f.precision(8);
  for (int r = 0; r < m.rows; r++) {
    for (int c = 0; c < m.cols; c++)
      f << m.at<float>(r, c) << (c + 1 < m.cols ? " " : "");
    f << "\n";
  }
}

static void dump_cvmat_u8(const std::string& path, const cv::Mat& m) {
  std::ofstream f(path);
  for (int r = 0; r < m.rows; r++) {
    for (int c = 0; c < m.cols; c++)
      f << int(m.at<unsigned char>(r, c)) << (c + 1 < m.cols ? " " : "");
    f << "\n";
  }
}

int main(int argc, char** argv) {
  std::string out_dir = argc > 1 ? argv[1] : ".";
  std::string data_dir = "/root/reference/detect_3d_cuboid/data/";

  // Demo inputs (values from reference main.cpp:37-50).
  Matrix3d Kalib;
  Kalib << 529.5, 0, 365.0, 0, 529.5, 265.0, 0, 0, 1.0;
  Matrix4d transToWolrd;
  transToWolrd << 1, 0.0011, 0.0004, 0,
                  0, -0.3376, 0.9413, 0,
                  0.0011, -0.9413, -0.3376, 1.35,
                  0, 0, 0, 1;
  MatrixXd obj_bbox_coors(1, 5);
  obj_bbox_coors << 188, 189, 201, 311, 0.88;
  obj_bbox_coors.leftCols<2>().array() -= 1;  // matlab -> c++ indexing

  cv::Mat rgb_img = cv::imread(data_dir + "0000_rgb_raw.jpg", 1);
  if (rgb_img.empty()) { std::cerr << "image load failed\n"; return 1; }

  MatrixXd all_lines_raw(100, 4);
  read_all_number_txt(data_dir + "edge_detection/LSD/0000_edge.txt", all_lines_raw);

  detect_3d_cuboid det;
  det.whether_plot_detail_images = false;
  det.whether_plot_final_images = false;
  det.print_details = false;
  det.set_calibration(Kalib);
  det.whether_sample_bbox_height = false;
  det.whether_sample_cam_roll_pitch = false;
  det.max_cuboid_num = 50;  // dump the whole ranked proposal set

  // ---- Stage dumps (same preprocessing recipe as the proposal loop,
  // box_proposal_detail.cpp:141-327, using the reference's own functions).
  cv::Mat gray_img;
  cv::cvtColor(rgb_img, gray_img, cv::COLOR_BGR2GRAY);
  int img_width = rgb_img.cols, img_height = rgb_img.rows;

  MatrixXd lines_aligned = all_lines_raw;
  align_left_right_edges(lines_aligned);
  dump_matrix(out_dir + "/lines_aligned.txt", lines_aligned);

  int left_x_raw = int(obj_bbox_coors(0, 0));
  int top_y_raw = int(obj_bbox_coors(0, 1));
  int obj_width_raw = int(obj_bbox_coors(0, 2));
  int obj_height_raw = int(obj_bbox_coors(0, 3));
  int right_x_raw = left_x_raw + obj_width_raw;
  int obj_height_expan = obj_height_raw;  // down_expand_sample = 0
  int down_y_expan = top_y_raw + obj_height_expan;
  int distmap_expand_wid =
      std::min(std::max(std::min(20, obj_width_raw - 100), 10),
               std::max(std::min(20, obj_height_expan - 100), 10));
  int left_x_expan_distmap = std::max(0, left_x_raw - distmap_expand_wid);
  int right_x_expan_distmap = std::min(img_width - 1, right_x_raw + distmap_expand_wid);
  int top_y_expan_distmap = std::max(0, top_y_raw - distmap_expand_wid);
  int down_y_expan_distmap = std::min(img_height - 1, down_y_expan + distmap_expand_wid);
  int height_expan_distmap = down_y_expan_distmap - top_y_expan_distmap;
  int width_expan_distmap = right_x_expan_distmap - left_x_expan_distmap;
  {
    std::ofstream f(out_dir + "/roi.txt");
    f << left_x_expan_distmap << " " << top_y_expan_distmap << " "
      << width_expan_distmap << " " << height_expan_distmap << "\n";
  }

  Vector2d lefttop(left_x_expan_distmap, top_y_expan_distmap);
  Vector2d rightbottom(right_x_expan_distmap, down_y_expan_distmap);
  MatrixXd inside(lines_aligned.rows(), 4);
  int n_inside = 0;
  for (int i = 0; i < lines_aligned.rows(); i++)
    if (check_inside_box(lines_aligned.row(i).head<2>(), lefttop, rightbottom) &&
        check_inside_box(lines_aligned.row(i).tail<2>(), lefttop, rightbottom))
      inside.row(n_inside++) = lines_aligned.row(i);
  dump_matrix(out_dir + "/lines_inside.txt", inside.topRows(n_inside));

  MatrixXd merged;
  merge_break_lines(inside.topRows(n_inside), merged, 20, 5, 30);
  dump_matrix(out_dir + "/lines_merged.txt", merged);

  cv::Rect object_bbox(left_x_expan_distmap, top_y_expan_distmap,
                       width_expan_distmap, height_expan_distmap);
  cv::Mat im_canny;
  cv::Canny(gray_img(object_bbox), im_canny, 80, 200);
  cv::Mat dist_map;
  cv::distanceTransform(255 - im_canny, dist_map, cv::DIST_L2, 3);
  dump_cvmat_u8(out_dir + "/canny.txt", im_canny);
  dump_cvmat_float(out_dir + "/dist_map.txt", dist_map);

  // ---- Full engine run: ranked proposal set.
  // The proposal loop prints unconditionally; silence stdout around it.
  std::vector<ObjectSet> all_object_cuboids;
  {
    std::FILE* old = stdout;
    (void)old;
    std::cout.setstate(std::ios_base::failbit);
    det.detect_cuboid(rgb_img, transToWolrd, obj_bbox_coors, all_lines_raw,
                      all_object_cuboids);
    std::cout.clear();
  }

  std::ofstream f(out_dir + "/proposals.txt");
  f.precision(10);
  f << "# pos_x pos_y pos_z scale_x scale_y scale_z rotY config0 config1 "
       "edge_dist_err edge_angle_err normalized_err skew_ratio corners2d(16)\n";
  if (!all_object_cuboids.empty()) {
    for (const cuboid* c : all_object_cuboids[0]) {
      f << c->pos(0) << " " << c->pos(1) << " " << c->pos(2) << " "
        << c->scale(0) << " " << c->scale(1) << " " << c->scale(2) << " "
        << c->rotY << " " << c->box_config_type(0) << " " << c->box_config_type(1)
        << " " << c->edge_distance_error << " " << c->edge_angle_error << " "
        << c->normalized_error << " " << c->skew_ratio;
      for (int j = 0; j < 8; j++)
        f << " " << c->box_corners_2d(0, j) << " " << c->box_corners_2d(1, j);
      f << "\n";
    }
  }
  std::cerr << "oracle: " << (all_object_cuboids.empty() ? 0 : all_object_cuboids[0].size())
            << " proposals dumped to " << out_dir << "\n";
  return 0;
}
